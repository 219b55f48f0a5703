"""Deterministic synthetic image+caption table (BASELINE.json input_hint).

Schema: (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64).  PIL is absent in this sandbox, so the codecs
are self-written byte formats (FIXTURES.md F1):

* ``ppm``  — P6-style: ``b'P6 <w> <h> 255\\n'`` + raw RGB24.
* ``raw``  — bare RGB24, w*h*3 bytes.
* ``lossy``— 6-bit-quantized RGB (pixel >> 2); decode reconstructs
  ``(q << 2) + 2``, giving PSNR ≈ 44 dB vs the original — above the
  north rule's ≥ 40 dB invariant for lossy formats.

Generation is **sharded**: ``image_batch(start, count, seed)`` produces any
row range independently (seeded per row), so the table can be produced by a
``ray.data.range(n).map_batches`` pipeline at any scale without driver-side
materialization.  ~1 % of rows carry planted violations, round-robin across
rules, with deterministic ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FMTS = ('ppm', 'raw', 'lossy')
FMT_WEIGHTS = (0.6, 0.25, 0.15)     # skewed on purpose (hot key for shuffles)

CAPTION_WORDS = (
    'sunset over mountains', 'a cat on a windowsill', 'city skyline at night',
    'forest path in autumn', 'waves crashing on rocks', 'portrait of a dog',
    'abstract geometric pattern', 'aerial view of farmland',
    'children playing football', 'vintage car on a road',
)

VIOLATION_KINDS = (
    'null_image_id',        # required/type violation
    'dup_phash_id',         # duplicate (phash, image_id) for dedup checks
    'dim_mismatch',         # w/h inconsistent with encoded payload
    'bad_fmt',              # fmt outside the enum
    'short_caption',        # caption failing minLength
    'orphan_phash',         # phash outside the reference key set
)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """pixels: uint8 array (h, w, 3)."""
    h, w, _ = pixels.shape
    if fmt == 'ppm':
        return b'P6 %d %d 255\n' % (w, h) + pixels.tobytes()
    if fmt == 'raw':
        return pixels.tobytes()
    if fmt == 'lossy':
        return b'L6 %d %d\n' % (w, h) + (pixels >> 2).astype(np.uint8).tobytes()
    raise ValueError('unknown fmt {!r}'.format(fmt))


def decode_image(data: bytes, fmt: str, w: int = None, h: int = None):
    """Returns uint8 (h, w, 3) pixels; raises ValueError on malformed data.

    This is the engine analog of the reference's contentEncoding decode
    transform (draft07.py:94-112): a parser stage that replaces the encoded
    value with its decoded form."""
    if fmt == 'ppm':
        if not data.startswith(b'P6 '):
            raise ValueError('bad ppm magic')
        header_end = data.index(b'\n')
        parts = data[3:header_end].split()
        w_, h_ = int(parts[0]), int(parts[1])
        body = data[header_end + 1:]
        if len(body) != w_ * h_ * 3:
            raise ValueError('ppm payload size mismatch')
        if w_ * h_ == 0:
            raise ValueError('zero-area image')
        return np.frombuffer(body, dtype=np.uint8).reshape(h_, w_, 3)
    if fmt == 'raw':
        if w is None or h is None:
            raise ValueError('raw needs dimensions')
        if len(data) != w * h * 3:
            raise ValueError('raw payload size mismatch')
        if w * h == 0:
            raise ValueError('zero-area image')
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt == 'lossy':
        if not data.startswith(b'L6 '):
            raise ValueError('bad lossy magic')
        header_end = data.index(b'\n')
        parts = data[3:header_end].split()
        w_, h_ = int(parts[0]), int(parts[1])
        body = data[header_end + 1:]
        if len(body) != w_ * h_ * 3:
            raise ValueError('lossy payload size mismatch')
        if w_ * h_ == 0:
            raise ValueError('zero-area image')
        q = np.frombuffer(body, dtype=np.uint8).reshape(h_, w_, 3)
        return ((q.astype(np.uint16) << 2) + 2).clip(0, 255).astype(np.uint8)
    raise ValueError('unknown fmt {!r}'.format(fmt))


def average_phash(pixels: np.ndarray) -> int:
    """Perceptual-hash stand-in: 8x8 average hash of the grayscale image →
    signed int64.  Deterministic, pure numpy."""
    # Integer channel sum instead of float mean: the x3 factor cancels in
    # the block>mean comparison, so the hash bits are unchanged while the
    # big float64 allocation disappears from the per-row hot path.
    gray = pixels.sum(axis=2, dtype=np.int32)
    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    block = gray[np.minimum(ys, h - 1)][:, np.minimum(xs, w - 1)]
    bits = (block > block.mean()).ravel()
    value = int.from_bytes(np.packbits(bits).tobytes(), 'big')
    return value - (1 << 64) if value >= (1 << 63) else value


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float('inf')
    return float(10 * np.log10(255.0 ** 2 / mse))


def row_content(i: int, seed: int = 42) -> dict:
    """Ground-truth content of row ``i`` before violation planting — the
    per-row oracle for the decoded-pixel / caption invariants (any row is
    reproducible independently from its index)."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    w = int(rng.integers(8, 33))
    h = int(rng.integers(8, 33))
    fmt = FMTS[rng.choice(len(FMTS), p=FMT_WEIGHTS)]
    # Smooth gradient + noise so phash has structure.
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255 / max(w - 1, 1))[..., None]
            * np.array([1.0, 0.6, 0.3]))
    noise = rng.integers(0, 64, (h, w, 3))
    pixels = np.clip(base + noise, 0, 255).astype(np.uint8)
    caption = '{} #{}'.format(
        CAPTION_WORDS[int(rng.integers(0, len(CAPTION_WORDS)))], i)
    return {'pixels': pixels, 'w': w, 'h': h, 'fmt': fmt,
            'caption': caption, 'phash': average_phash(pixels)}


def image_batch(start: int, count: int, seed: int = 42,
                violation_rate: float = 0.01) -> pa.Table:
    """Deterministically generate rows [start, start+count) of the synthetic
    table.  Any shard can be produced independently (per-row seeding), so
    generation parallelizes over row ranges."""
    ids, blobs, ws, hs, fmts, captions, phashes = [], [], [], [], [], [], []
    violation_every = max(1, int(round(1.0 / violation_rate))) \
        if violation_rate > 0 else 0
    for i in range(start, start + count):
        content = row_content(i, seed)
        pixels = content['pixels']
        w, h, fmt = content['w'], content['h'], content['fmt']
        caption = content['caption']
        image_id = 'img-%012d' % i
        ph = content['phash']

        kind = None
        if violation_every and i % violation_every == 0 and i > 0:
            kind = VIOLATION_KINDS[(i // violation_every) % len(VIOLATION_KINDS)]
        if kind == 'null_image_id':
            image_id = None
        elif kind == 'dup_phash_id':
            # Clone row i-1's identity → duplicate (phash, image_id).
            prev = image_batch(i - 1, 1, seed=seed, violation_rate=0)
            image_id = prev.column('image_id')[0].as_py()
            ph = prev.column('phash')[0].as_py()
        elif kind == 'dim_mismatch':
            w += 5   # declared != encoded
        elif kind == 'bad_fmt':
            fmt_declared = 'jpeg'
        elif kind == 'short_caption':
            caption = 'x'
        elif kind == 'orphan_phash':
            ph = -1  # never produced by average_phash (top bit pattern)

        encoded = encode_image(pixels, fmt)
        fmts.append(fmt_declared if kind == 'bad_fmt' else fmt)
        ids.append(image_id)
        blobs.append(encoded)
        ws.append(w)
        hs.append(h)
        captions.append(caption)
        phashes.append(ph)
    return pa.table({
        'image_id': pa.array(ids, type=pa.string()),
        'bytes': pa.array(blobs, type=pa.binary()),
        'w': pa.array(ws, type=pa.int32()),
        'h': pa.array(hs, type=pa.int32()),
        'fmt': pa.array(fmts, type=pa.string()),
        'caption': pa.array(captions, type=pa.string()),
        'phash': pa.array(phashes, type=pa.int64()),
    })


def image_dataset(n_rows: int, seed: int = 42, violation_rate: float = 0.01,
                  shard_size: int = 4096):
    """Distributed generation: ray.data.range → per-shard image_batch.
    No driver-side materialization; scales to any n_rows."""
    import ray.data

    def gen(batch):
        idx = batch['id']
        start = int(idx.min())
        count = int(len(idx))
        return image_batch(start, count, seed=seed,
                           violation_rate=violation_rate)

    return ray.data.range(
        n_rows, override_num_blocks=max(1, n_rows // shard_size)
    ).map_batches(gen, batch_format='numpy', batch_size=shard_size)


def write_image_table(path: str, n_rows: int, seed: int = 42,
                      violation_rate: float = 0.01):
    """Materialize the synthetic table as partitioned parquet (one file per
    shard → resumable, parallel reads)."""
    ds = image_dataset(n_rows, seed=seed, violation_rate=violation_rate)
    ds.write_parquet(path)
    return path
