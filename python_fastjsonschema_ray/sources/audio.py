"""Deterministic synthetic audio table + A6 PCM codec.

Third modality beside images (``sources/images.py``) and videos
(``sources/videos.py``): an audio clip is an opaque ``binary`` column
with typed metadata (sample_rate, n_samples, channels).

Codec ``A6``: ``b'A6 <sample_rate> <n_samples> <channels> 16\n'`` +
little-endian int16 PCM, interleaved when channels > 1.  Clips are a
deterministic seeded sine mix + noise, reproducible per index — the
per-row oracle for feature-extraction tests.

Real formats (wav/mp3/flac) need external codecs absent in this
sandbox; ``stages/audio.py:ExternalAudioDecodeStage`` is the documented
stub seam, with this synthetic codec exercising the identical Ray-side
plumbing (schema, batch sizing, feature output layout).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

AUDIO_SCHEMA = pa.schema([
    ('audio_id', pa.string()),
    ('bytes', pa.binary()),
    ('sample_rate', pa.int32()),
    ('n_samples', pa.int32()),
    ('channels', pa.int32()),
    ('fmt', pa.string()),
])


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """samples: int16 (n,) mono or (n, channels)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    head = b'A6 %d %d %d 16\n' % (sample_rate, n, ch)
    return head + samples.astype('<i2').tobytes()


def parse_audio_header(data: bytes, payload_len: int = None):
    """Returns (sample_rate, n_samples, channels, payload_offset);
    ``data`` may be just the first <=64 bytes when ``payload_len`` (the
    FULL payload length) is given."""
    if not data.startswith(b'A6 '):
        raise ValueError('not an A6 payload')
    end = data.find(b'\n', 0, 64)
    if end < 0:
        raise ValueError('unterminated A6 header')
    parts = data[3:end].split()
    if len(parts) != 4 or parts[3] != b'16':
        raise ValueError('malformed A6 header')
    sr, n, ch = (int(p) for p in parts[:3])
    if sr <= 0 or n <= 0 or ch <= 0:
        raise ValueError('non-positive A6 dimensions')
    total = payload_len if payload_len is not None else len(data)
    if total - (end + 1) != n * ch * 2:
        raise ValueError('A6 payload length mismatch')
    return sr, n, ch, end + 1


def decode_audio(data: bytes) -> tuple:
    """Returns (samples int16 (n, ch), sample_rate)."""
    sr, n, ch, off = parse_audio_header(data)
    samples = np.frombuffer(data, dtype='<i2', offset=off,
                            count=n * ch).reshape(n, ch)
    return samples, sr


def audio_content(i: int, seed: int = 42) -> dict:
    """Ground truth for clip ``i``: a two-tone sine mix with seeded
    noise; ~1/16 clips are intentionally CLIPPED (amplitude beyond
    int16) to exercise the clipping-fraction feature."""
    rng = np.random.default_rng(seed * 3_000_017 + i)
    sr = int(rng.choice([8000, 16000]))
    dur = float(rng.uniform(0.2, 1.0))
    n = int(sr * dur)
    t = np.arange(n) / sr
    f1 = float(rng.uniform(100, 1000))
    f2 = float(rng.uniform(1000, 3500))
    amp = 0.5 if i % 16 else 2.2          # every 16th clip clips
    #   peak = amp * 12000 * 1.5: 0.5 -> 9000 (clean), 2.2 -> 39600
    #   (beyond the int16 rail, so np.clip saturates a real fraction)
    wave = (amp * 12000 * (np.sin(2 * np.pi * f1 * t)
                           + 0.5 * np.sin(2 * np.pi * f2 * t))
            + rng.normal(0, 400, n))
    samples = np.clip(wave, -32768, 32767).astype(np.int16)
    return {'samples': samples, 'sample_rate': sr, 'n_samples': n,
            'f1': f1, 'f2': f2, 'clipped': amp > 1.0}


def audio_batch(start: int, count: int, seed: int = 42) -> pa.Table:
    ids, blobs, srs, ns, chs = [], [], [], [], []
    for i in range(start, start + count):
        c = audio_content(i, seed)
        ids.append('aud-%012d' % i)
        blobs.append(encode_audio(c['samples'], c['sample_rate']))
        srs.append(c['sample_rate'])
        ns.append(c['n_samples'])
        chs.append(1)
    return pa.table({
        'audio_id': pa.array(ids, type=pa.string()),
        'bytes': pa.array(blobs, type=pa.binary()),
        'sample_rate': pa.array(srs, type=pa.int32()),
        'n_samples': pa.array(ns, type=pa.int32()),
        'channels': pa.array(chs, type=pa.int32()),
        'fmt': pa.array(['a6'] * count, type=pa.string()),
    })


def audio_dataset(n_rows: int, seed: int = 42, shard_rows: int = 128):
    """Sharded Ray Dataset of synthetic clips (per-row seeding: any
    shard generates independently, nothing materializes on the
    driver)."""
    import ray.data

    n_shards = max(1, (n_rows + shard_rows - 1) // shard_rows)

    def gen(batch):
        out = []
        for s in batch['id'].tolist():
            lo = s * shard_rows
            hi = min(lo + shard_rows, n_rows)
            if hi > lo:
                out.append(audio_batch(lo, hi - lo, seed))
        return (pa.concat_tables(out) if out
                else AUDIO_SCHEMA.empty_table())

    return ray.data.range(n_shards, override_num_blocks=n_shards) \
        .map_batches(gen, batch_format='numpy')
