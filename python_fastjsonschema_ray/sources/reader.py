"""Storage adapters.

The north rule's table lives in Lance format on real clusters;
``pylance`` is not installed in this sandbox, so the reader auto-detects:
``read_table`` uses ``ray.data.read_lance`` when the dataset is Lance and
the library is importable, else parquet (TESTDATA.md fragments).  Column
pruning is always pushed to the read.
"""

from __future__ import annotations

import os


def _is_lance(path: str) -> bool:
    return path.endswith('.lance') or os.path.isdir(os.path.join(path, '_versions'))


def read_table(path: str, columns=None, **kwargs):
    """ray.data reader with format auto-detection + column pruning."""
    import ray.data

    if _is_lance(path):
        try:
            import lance  # noqa: F401
            return ray.data.read_lance(path, columns=columns, **kwargs)
        except ImportError:
            raise ImportError(
                'dataset at {} looks like Lance but pylance is not '
                'installed; install pylance or convert to parquet'.format(path))
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds, path: str, **kwargs):
    """Partitioned parquet sink (one file per block — resumable layout)."""
    ds.write_parquet(path, **kwargs)
    return path
