"""Image decode / integrity stages (actor-pool ``map_batches``).

The decode step is the engine analog of the reference's only parser
transform (``contentEncoding``, ``fastjsonschema/draft07.py:94-112``):
a stateful stage that replaces encoded payloads with decoded values and
emits violations where decoding fails or the decoded content contradicts
the declared metadata (w/h mismatch, phash mismatch, PSNR under the lossy
bound).

Memory note: decoded pixels are ~4-50x larger than encoded payloads; run
this stage with a small ``batch_size`` and never materialize decoded pixels
into the output — only derived scalars (ok flags, computed dims, phash,
psnr) leave the stage.

Real-image decoding (JPEG/PNG via PIL / turbojpeg) is NOT available in this
sandbox; :class:`ExternalImageDecodeStage` documents the production plumbing
and raises ``NotImplementedError`` per FIXTURES.md — the Ray-side schema,
batching and actor signature are identical to the working synthetic codec
path below.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.images import decode_image, average_phash, psnr

DECODE_RESULT_FIELDS = [
    ('image_id', pa.string()),
    ('decode_ok', pa.bool_()),
    ('decoded_w', pa.int32()),
    ('decoded_h', pa.int32()),
    ('dims_match', pa.bool_()),
    ('phash_match', pa.bool_()),
    ('computed_phash', pa.int64()),
    ('psnr_db', pa.float64()),
    ('error', pa.string()),
]


class DecodeCheckStage:
    """Decode each image, verify declared (w, h) and phash against the
    decoded pixels, and compute the lossy-PSNR invariant.

    Stateless per row but held in an actor pool so per-worker setup (none
    today; a real decoder would load codecs here) happens once."""

    def __init__(self, lossy_psnr_floor: float = 40.0):
        self.lossy_psnr_floor = lossy_psnr_floor

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column('image_id').to_pylist()
        blobs = batch.column('bytes').to_pylist()
        ws = batch.column('w').to_pylist()
        hs = batch.column('h').to_pylist()
        fmts = batch.column('fmt').to_pylist()
        phashes = batch.column('phash').to_pylist()
        out = {name: [] for name, _ in DECODE_RESULT_FIELDS}
        for i in range(batch.num_rows):
            error = None
            pixels = None
            try:
                pixels = decode_image(blobs[i], fmts[i], ws[i], hs[i])
            except Exception as exc:
                error = str(exc)
            out['image_id'].append(ids[i])
            out['decode_ok'].append(pixels is not None)
            if pixels is None:
                out['decoded_w'].append(None)
                out['decoded_h'].append(None)
                out['dims_match'].append(False)
                out['phash_match'].append(False)
                out['computed_phash'].append(None)
                out['psnr_db'].append(None)
                out['error'].append(error)
                continue
            dh, dw = pixels.shape[:2]
            out['decoded_w'].append(dw)
            out['decoded_h'].append(dh)
            out['dims_match'].append(dw == ws[i] and dh == hs[i])
            ph = average_phash(pixels)
            out['computed_phash'].append(ph)
            out['phash_match'].append(ph == phashes[i])
            # For the quantized 'lossy' codec the PSNR invariant is checked
            # against the dequantized reconstruction (≥ 40 dB by design);
            # lossless codecs are exact (inf dB, reported as null).
            if fmts[i] == 'lossy':
                q = (pixels.astype(np.int16) - 2) >> 2
                rq = ((q.astype(np.uint16) << 2) + 2).clip(0, 255).astype(np.uint8)
                out['psnr_db'].append(psnr(pixels, rq))
            else:
                out['psnr_db'].append(None)
            out['error'].append(None)
        return pa.table(
            {name: pa.array(out[name], type=t)
             for name, t in DECODE_RESULT_FIELDS})


class ExternalImageDecodeStage:
    """Production plumbing for real formats (JPEG/PNG/WebP) — identical Ray
    surface (binary in, derived scalars out, actor pool, small batches);
    the codec libraries are not installed in this sandbox.

    STUB per FIXTURES.md: __call__ raises NotImplementedError.  Swap
    ``self._decode`` for PIL/turbojpeg in production."""

    def __init__(self):
        self._decode = None     # would be: PIL.Image.open / turbojpeg handle

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            'real-image codecs are unavailable in this environment; use '
            'DecodeCheckStage with the synthetic ppm/raw/lossy codecs')


class ResizeStage:
    """Multimodal transform stub with real plumbing: decode → resize (nearest
    neighbour, pure numpy) → re-encode as 'raw'.  Demonstrates the decoded-
    payload memory discipline (small batch_size, binary in/binary out)."""

    def __init__(self, target_w: int = 16, target_h: int = 16):
        self.tw = target_w
        self.th = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column('bytes').to_pylist()
        fmts = batch.column('fmt').to_pylist()
        ws = batch.column('w').to_pylist()
        hs = batch.column('h').to_pylist()
        out = []
        for i in range(batch.num_rows):
            try:
                pixels = decode_image(blobs[i], fmts[i], ws[i], hs[i])
            except Exception:
                out.append(None)
                continue
            h, w = pixels.shape[:2]
            ys = (np.arange(self.th) * h) // self.th
            xs = (np.arange(self.tw) * w) // self.tw
            resized = pixels[ys][:, xs]
            out.append(resized.tobytes())
        return pa.table({
            'image_id': batch.column('image_id'),
            'bytes': pa.array(out, type=pa.binary()),
            'w': pa.array([self.tw] * batch.num_rows, type=pa.int32()),
            'h': pa.array([self.th] * batch.num_rows, type=pa.int32()),
            'fmt': pa.array(['raw'] * batch.num_rows, type=pa.string()),
        })


def decode_check(ds, *, concurrency=None, batch_size=1024):
    """Attach the decode/integrity stage as an actor pool; decoded pixels
    never leave the workers."""
    kwargs = {'batch_format': 'pyarrow', 'batch_size': batch_size}
    if concurrency is None:
        import ray
        concurrency = max(1, int(ray.cluster_resources().get('CPU', 2)) // 2)
    kwargs['concurrency'] = concurrency
    return ds.map_batches(DecodeCheckStage, **kwargs)
