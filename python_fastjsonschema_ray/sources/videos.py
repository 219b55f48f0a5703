"""Deterministic synthetic video table + V6 byte codec.

Extension of the image table (``sources/images.py``, FIXTURES.md F1) to
the video modality the multimodal pipeline needs: a video is an opaque
``binary`` column with typed metadata (w, h, n_frames, fps), and the
frame payload is addressable by OFFSET — sampling frame k slices
``header + k * w*h*3`` bytes without touching the other frames, which is
the property a real container (keyframe index) gives a 100-TB pipeline.

Codec ``V6``: ``b'V6 <w> <h> <n_frames> <fps> 255\n'`` + n_frames raw
RGB24 frames (w*h*3 bytes each).  Frames are a deterministic per-video
gradient animated by a per-frame brightness ramp + seeded noise, so any
(video, frame) pixel block is reproducible independently — the per-row
oracle for frame-sampling tests.

Real containers (mp4/webm) need external codecs that are absent in this
sandbox; ``stages/decode.py:ExternalVideoDecodeStage`` is the documented
stub seam, with this synthetic codec exercising the identical Ray-side
plumbing (schema, batch slicing, flat frame output).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .images import average_phash

VIDEO_SCHEMA = pa.schema([
    ('video_id', pa.string()),
    ('bytes', pa.binary()),
    ('w', pa.int32()),
    ('h', pa.int32()),
    ('n_frames', pa.int32()),
    ('fps', pa.int32()),
    ('fmt', pa.string()),
])


def encode_video(frames: np.ndarray, fps: int = 8) -> bytes:
    """frames: uint8 (n, h, w, 3)."""
    n, h, w, _ = frames.shape
    return (b'V6 %d %d %d %d 255\n' % (w, h, n, fps)) + frames.tobytes()


def parse_video_header(data: bytes, payload_len: int = None):
    """Returns (w, h, n_frames, fps, payload_offset); raises ValueError
    on malformed headers.  ``data`` may be just the first <=64 bytes when
    ``payload_len`` (the FULL payload length) is given — callers slicing
    frames by offset never need to copy the whole video."""
    if not data.startswith(b'V6 '):
        raise ValueError('not a V6 payload')
    end = data.find(b'\n', 0, 64)
    if end < 0:
        raise ValueError('unterminated V6 header')
    parts = data[3:end].split()
    if len(parts) != 5 or parts[4] != b'255':
        raise ValueError('malformed V6 header')
    w, h, n, fps = (int(p) for p in parts[:4])
    if w <= 0 or h <= 0 or n <= 0 or fps <= 0:
        raise ValueError('non-positive V6 dimensions')
    total = payload_len if payload_len is not None else len(data)
    if total - (end + 1) != n * w * h * 3:
        raise ValueError('V6 payload length mismatch')
    return w, h, n, fps, end + 1


def decode_frame(data: bytes, idx: int) -> np.ndarray:
    """Decode ONE frame by offset — O(frame), not O(video)."""
    w, h, n, _, off = parse_video_header(data)
    if not 0 <= idx < n:
        raise ValueError('frame index {} out of range 0..{}'.format(
            idx, n - 1))
    size = w * h * 3
    start = off + idx * size
    return np.frombuffer(data[start:start + size],
                         dtype=np.uint8).reshape(h, w, 3)


def video_content(i: int, seed: int = 42) -> dict:
    """Ground truth for video ``i`` (pre-encoding): reproducible from the
    index alone, like ``images.row_content``."""
    rng = np.random.default_rng(seed * 2_000_003 + i)
    w = int(rng.integers(8, 25))
    h = int(rng.integers(8, 25))
    n = int(rng.integers(4, 17))
    fps = int(rng.choice([4, 8, 12]))
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 255 / max(w - 1, 1))[..., None]
            * np.array([1.0, 0.6, 0.3]))
    noise = rng.integers(0, 48, (n, h, w, 3))
    # Per-frame brightness ramp animates the gradient.
    ramp = (np.arange(n, dtype=np.float64) * 24.0 / max(n - 1, 1))
    frames = np.clip(base[None] + ramp[:, None, None, None] + noise,
                     0, 255).astype(np.uint8)
    return {'frames': frames, 'w': w, 'h': h, 'n_frames': n, 'fps': fps}


def video_batch(start: int, count: int, seed: int = 42) -> pa.Table:
    """Rows [start, start+count) of the synthetic video table; any shard
    generates independently (per-row seeding)."""
    ids, blobs, ws, hs, ns, fpss = [], [], [], [], [], []
    for i in range(start, start + count):
        c = video_content(i, seed)
        ids.append('vid-%012d' % i)
        blobs.append(encode_video(c['frames'], c['fps']))
        ws.append(c['w'])
        hs.append(c['h'])
        ns.append(c['n_frames'])
        fpss.append(c['fps'])
    return pa.table({
        'video_id': pa.array(ids, type=pa.string()),
        'bytes': pa.array(blobs, type=pa.binary()),
        'w': pa.array(ws, type=pa.int32()),
        'h': pa.array(hs, type=pa.int32()),
        'n_frames': pa.array(ns, type=pa.int32()),
        'fps': pa.array(fpss, type=pa.int32()),
        'fmt': pa.array(['v6'] * count, type=pa.string()),
    })


def video_dataset(n_rows: int, seed: int = 42, shard_rows: int = 64):
    """Sharded Ray Dataset of synthetic videos — generation parallelizes
    over row ranges, nothing materializes on the driver."""
    import ray.data

    n_shards = max(1, (n_rows + shard_rows - 1) // shard_rows)

    def gen(batch):
        out = []
        for s in batch['id'].tolist():
            lo = s * shard_rows
            hi = min(lo + shard_rows, n_rows)
            if hi > lo:
                out.append(video_batch(lo, hi - lo, seed))
        return (pa.concat_tables(out) if out
                else VIDEO_SCHEMA.empty_table())

    return ray.data.range(n_shards, override_num_blocks=n_shards) \
        .map_batches(gen, batch_format='numpy')


def frame_phash(video_index: int, frame_idx: int, seed: int = 42) -> int:
    """Oracle: phash of one ground-truth frame."""
    return average_phash(video_content(video_index, seed)['frames'][frame_idx])
