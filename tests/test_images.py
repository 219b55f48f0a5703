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
