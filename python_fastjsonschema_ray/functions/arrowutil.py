"""Small Arrow interop helpers shared by embedding stages."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def embedding_matrix(column) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> / fixed-size-list /
    Ray-tensor-extension column."""
    arr = column.combine_chunks() if isinstance(column, pa.ChunkedArray) \
        else column
    t = arr.type
    if isinstance(t, pa.ExtensionType):
        # Ray's ArrowTensorArray and friends expose to_numpy via the
        # extension array; fall back through storage.
        try:
            return np.asarray(arr.to_numpy(zero_copy_only=False),
                              dtype=np.float64)
        except Exception:
            arr = arr.storage
            t = arr.type
    if pa.types.is_fixed_size_list(t):
        dim = t.list_size
        flat = np.asarray(arr.values, dtype=np.float64)
        return flat.reshape(len(arr), dim)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        flat = np.asarray(arr.flatten(), dtype=np.float64)
        return flat.reshape(len(arr), -1)
    return np.stack([np.asarray(v, dtype=np.float64)
                     for v in arr.to_pylist()])
