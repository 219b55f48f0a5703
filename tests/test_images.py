"""Synthetic image table: codec round trips, PSNR invariant, determinism,
planted violations, decode stage."""

import numpy as np
import pyarrow as pa

from python_fastjsonschema_ray.sources.images import (
    FMTS, average_phash, decode_image, encode_image, image_batch, psnr)
from python_fastjsonschema_ray.stages.decode import DecodeCheckStage


def _pixels(seed=0, w=24, h=16):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_codec_roundtrip_lossless():
    px = _pixels()
    for fmt in ('ppm', 'raw'):
        decoded = decode_image(encode_image(px, fmt), fmt, 24, 16)
        assert np.array_equal(decoded, px)


def test_codec_lossy_psnr_above_40db():
    """The north-rule invariant: lossy decode must reach PSNR >= 40 dB."""
    for seed in range(5):
        px = _pixels(seed)
        decoded = decode_image(encode_image(px, 'lossy'), 'lossy')
        assert psnr(px, decoded) >= 40.0


def test_generation_deterministic_and_sharded():
    t1 = image_batch(0, 50)
    t2 = image_batch(0, 50)
    assert t1.equals(t2)
    # Shard independence: rows 30..50 generated alone match the full run.
    shard = image_batch(30, 20)
    assert shard.equals(t1.slice(30, 20))


def test_planted_violations_present():
    t = image_batch(0, 1200)
    ids = t.column('image_id').to_pylist()
    fmts = t.column('fmt').to_pylist()
    captions = t.column('caption').to_pylist()
    phashes = t.column('phash').to_pylist()
    assert any(i is None for i in ids)
    assert any(f not in FMTS for f in fmts)
    assert any(len(c) < 2 for c in captions)
    assert any(p == -1 for p in phashes)
    # Duplicate (phash, image_id) pairs exist.
    pairs = [(p, i) for p, i in zip(phashes, ids) if i is not None]
    assert len(pairs) != len(set(pairs))


def test_decode_stage_flags_planted_dim_mismatch():
    t = image_batch(0, 1200)
    out = DecodeCheckStage()(t)
    rows = out.to_pylist()
    src = t.to_pylist()
    mismatches = [r for r in rows if r['decode_ok'] and not r['dims_match']]
    assert mismatches, 'expected planted dim mismatches'
    # Clean rows decode consistently and keep their phash.
    clean = [i for i, (r, s) in enumerate(zip(rows, src))
             if r['decode_ok'] and r['dims_match'] and s['fmt'] in FMTS]
    assert clean
    for i in clean[:50]:
        if src[i]['fmt'] != 'lossy' and src[i]['phash'] != -1:
            assert rows[i]['phash_match'], (rows[i], src[i])


def test_phash_stable():
    px = _pixels(3)
    assert average_phash(px) == average_phash(px.copy())


def test_per_row_content_invariant():
    """North-rule per-row invariant: for every non-planted row, decoding the
    stored bytes reproduces the ground-truth pixels exactly (lossless) or at
    PSNR >= 40 dB (lossy), and the caption equals the ground truth."""
    from python_fastjsonschema_ray.sources.images import row_content
    t = image_batch(0, 800, seed=42, violation_rate=0.01)
    rows = t.to_pylist()
    checked = 0
    for i, row in enumerate(rows):
        truth = row_content(i, seed=42)
        if row['image_id'] != 'img-%012d' % i or row['fmt'] != truth['fmt'] \
                or row['w'] != truth['w'] or row['caption'] != truth['caption'] \
                or row['phash'] != truth['phash']:
            continue  # planted-violation row
        decoded = decode_image(row['bytes'], row['fmt'], row['w'], row['h'])
        if row['fmt'] == 'lossy':
            assert psnr(truth['pixels'], decoded) >= 40.0
        else:
            assert np.array_equal(decoded, truth['pixels'])
        assert row['caption'] == truth['caption']
        checked += 1
    assert checked >= 780


def test_decode_vectorized_matches_rowloop():
    """The vectorized __call__ must be outcome-identical to the per-row
    reference path (_call_rowloop) on a corpus dense with planted
    violations PLUS handcrafted adversarial rows: null blobs, null
    dims, unknown/null fmt, bad magic, truncated/whitespace-mangled
    headers, size mismatches, signed and overlong header ints."""
    t = image_batch(0, 1500, seed=7, violation_rate=0.15)
    good = decode_image(t.column('bytes')[0].as_py(), 'ppm') \
        if t.column('fmt')[0].as_py() == 'ppm' else None  # noqa: F841
    adv_rows = [
        # (bytes, fmt, w, h)
        (None, 'ppm', 3, 3),
        (None, 'raw', None, 2),
        (b'', 'ppm', 2, 2),
        (b'', None, 2, 2),
        (b'P6 2 2\n' + b'x' * 12, 'ppm', 2, 2),          # clean ok
        (b'L6 2 2\n' + b'x' * 12, 'lossy', 2, 2),        # clean ok
        (b'P6 2 2\n' + b'x' * 11, 'ppm', 2, 2),          # size mismatch
        (b'Q6 2 2\n' + b'x' * 12, 'ppm', 2, 2),          # bad magic
        (b'P6 2 2\n' + b'x' * 12, 'lossy', 2, 2),        # magic vs fmt
        (b'P6  2 2\n' + b'x' * 12, 'ppm', 2, 2),         # double space
        (b'P6 +2 2\n' + b'x' * 12, 'ppm', 2, 2),         # signed int
        (b'P6 2 2 255\n' + b'x' * 12, 'ppm', 2, 2),      # third field
        (b'P6 1_2 2\n' + b'x' * 72, 'ppm', 12, 2),       # underscore int
        (b'P6 99999999 2\n', 'ppm', 2, 2),               # 8-digit dim
        (b'P6 2 2', 'ppm', 2, 2),                        # no newline
        (b'P6 ' + b'9' * 40, 'ppm', 2, 2),               # header > 32B
        (b'x' * 12, 'raw', 2, 2),                        # raw ok
        (b'x' * 12, 'raw', None, 2),                     # raw null dim
        (b'x' * 11, 'raw', 2, 2),                        # raw bad size
        (b'x' * 12, 'webp', 2, 2),                       # unknown fmt
        (b'P6 0 0\n', 'ppm', 0, 0),                      # zero dims
        (b'L6 0 0\n', 'lossy', 0, 0),                    # zero dims lossy
        (b'', 'raw', 0, 0),                              # zero dims raw
        (b'', 'raw', 0, 5),                              # zero width raw
        (b'P6 0 3\n', 'ppm', 0, 3),                      # zero width ppm
    ]
    import pyarrow as pa
    base = t.to_pylist()
    for i, (blob, fmt, w, h) in enumerate(adv_rows):
        base.append({'image_id': 'adv-%03d' % i, 'bytes': blob,
                     'w': w, 'h': h, 'fmt': fmt,
                     'caption': 'adv', 'phash': 0})
    full = pa.Table.from_pylist(base, schema=t.schema)
    stage = DecodeCheckStage()
    fast = stage(full).to_pylist()
    slow = stage._call_rowloop(full).to_pylist()
    assert len(fast) == len(slow)
    for i, (a, b) in enumerate(zip(fast, slow)):
        assert a == b, (i, full.slice(i, 1).to_pylist(), a, b)
    # Sliced (non-zero offset) batches read the right buffer windows.
    sl = full.slice(700, 500)
    assert stage(sl).to_pylist() == stage._call_rowloop(sl).to_pylist()


def test_decode_zero_area_explicit_error():
    """A zero-area image (w*h == 0) passes every payload-size check
    (0 == 0*3) but must NOT reach the phash gather: as the only row in
    a batch its body offset is 0, so the gather's hv-1 = -1 positions
    would index out of an empty buffer (uncaught IndexError in the Ray
    task).  Both paths now emit an explicit 'zero-area image' error."""
    import pyarrow as pa
    rows = [
        {'image_id': 'z0', 'bytes': b'P6 0 0\n', 'w': 0, 'h': 0,
         'fmt': 'ppm', 'caption': 'z', 'phash': 0},
        {'image_id': 'z1', 'bytes': b'', 'w': 0, 'h': 0,
         'fmt': 'raw', 'caption': 'z', 'phash': 0},
        {'image_id': 'z2', 'bytes': b'L6 0 0\n', 'w': 0, 'h': 0,
         'fmt': 'lossy', 'caption': 'z', 'phash': 0},
    ]
    schema = pa.schema([('image_id', pa.string()), ('bytes', pa.binary()),
                        ('w', pa.int32()), ('h', pa.int32()),
                        ('fmt', pa.string()), ('caption', pa.string()),
                        ('phash', pa.int64())])
    t = pa.Table.from_pylist(rows, schema=schema)
    stage = DecodeCheckStage()
    for out in (stage(t).to_pylist(), stage._call_rowloop(t).to_pylist()):
        assert all(not r['decode_ok'] for r in out)
        assert all(r['error'] == 'zero-area image' for r in out)
    # Single-row batches (the empty-buffer crash repro) survive too.
    for row in rows:
        one = pa.Table.from_pylist([row], schema=schema)
        assert stage(one).to_pylist() == stage._call_rowloop(one).to_pylist()
    # The scalar decode path agrees.
    import pytest as _pytest
    from python_fastjsonschema_ray.sources.images import decode_image
    for blob, fmt in ((b'P6 0 0\n', 'ppm'), (b'', 'raw'),
                      (b'L6 0 0\n', 'lossy')):
        with _pytest.raises(ValueError, match='zero-area image'):
            decode_image(blob, fmt, 0, 0)


def test_decode_vectorized_fuzz_headers():
    """Hypothesis-style fuzz (explicit rng for speed): random header
    bytes / fmts / dims through both decode paths must agree exactly."""
    import pyarrow as pa
    rng = np.random.default_rng(123)
    alphabet = b'P6L \n0123456789x_+-'
    rows = []
    for i in range(600):
        kind = rng.integers(0, 4)
        if kind == 0:        # random header + plausible body
            hdr = bytes(alphabet[j] for j in
                        rng.integers(0, len(alphabet),
                                     rng.integers(0, 40)))
            blob = hdr + bytes(rng.integers(0, 256, 12, dtype=np.uint8))
        elif kind == 1:      # well-formed with random dims
            w, h = int(rng.integers(0, 5)), int(rng.integers(0, 5))
            magic = b'P6 ' if rng.integers(0, 2) else b'L6 '
            body = bytes(rng.integers(0, 256, w * h * 3, dtype=np.uint8))
            blob = magic + str(w).encode() + b' ' + str(h).encode() \
                + b'\n' + body
        elif kind == 2:      # truncated well-formed
            blob = b'P6 2 2\n' + b'q' * int(rng.integers(0, 12))
        else:                # raw body
            blob = bytes(rng.integers(0, 256,
                                      rng.integers(0, 16), dtype=np.uint8))
        fmt = ['ppm', 'lossy', 'raw', 'webp', None][rng.integers(0, 5)]
        w = [None, 0, 2, 4][rng.integers(0, 4)]
        h = [None, 0, 2, 4][rng.integers(0, 4)]
        rows.append({'image_id': 'f-%04d' % i, 'bytes': blob, 'w': w,
                     'h': h, 'fmt': fmt, 'caption': 'c', 'phash': 0})
    schema = pa.schema([('image_id', pa.string()), ('bytes', pa.binary()),
                        ('w', pa.int32()), ('h', pa.int32()),
                        ('fmt', pa.string()), ('caption', pa.string()),
                        ('phash', pa.int64())])
    t = pa.Table.from_pylist(rows, schema=schema)
    stage = DecodeCheckStage()
    fast = stage(t).to_pylist()
    slow = stage._call_rowloop(t).to_pylist()
    for i, (a, b) in enumerate(zip(fast, slow)):
        assert a == b, (i, rows[i], a, b)
