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


def _strip_compression(name: str) -> str:
    for ext in ('.gz', '.zst', '.bz2'):
        if name.endswith(ext):
            return name[:-len(ext)]
    return name


def read_table(path: str, columns=None, **kwargs):
    """ray.data reader with format auto-detection + column pruning.

    Formats: Lance (real clusters), Parquet (default), JSON/JSONL (the
    reference's native document format — one JSON object per line), and
    CSV.  Parquet/Lance push ``columns`` into the scan; JSONL/CSV read
    full records and project immediately after (those formats are
    row-oriented — there is nothing to push down to)."""
    import ray.data

    if isinstance(path, (list, tuple)):
        probe = path[0] if path else ''
        if not _is_lance(probe):
            base = _strip_compression(str(probe).rstrip('/'))
            if base.endswith(('.json', '.jsonl', '.ndjson')):
                ds = ray.data.read_json(list(path), **kwargs)
                return (ds.select_columns(list(columns))
                        if columns else ds)
            if base.endswith(('.csv', '.tsv')):
                if base.endswith('.tsv'):
                    from pyarrow import csv as pacsv
                    kwargs.setdefault('parse_options',
                                      pacsv.ParseOptions(delimiter='\t'))
                ds = ray.data.read_csv(list(path), **kwargs)
                return (ds.select_columns(list(columns))
                        if columns else ds)
            return ray.data.read_parquet(list(path), columns=columns,
                                         **kwargs)
        path = probe

    if _is_lance(path):
        try:
            import lance  # noqa: F401
            return ray.data.read_lance(path, columns=columns, **kwargs)
        except ImportError:
            raise ImportError(
                'dataset at {} looks like Lance but pylance is not '
                'installed; install pylance or convert to parquet'.format(path))
    base = _strip_compression(path.rstrip('/'))
    if base.endswith(('.json', '.jsonl', '.ndjson')):
        ds = ray.data.read_json(path, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    if base.endswith(('.csv', '.tsv')):
        if base.endswith('.tsv'):
            from pyarrow import csv as pacsv
            kwargs.setdefault('parse_options',
                              pacsv.ParseOptions(delimiter='\t'))
        ds = ray.data.read_csv(path, **kwargs)
        return ds.select_columns(list(columns)) if columns else ds
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def write_table(ds, path: str, format: str = 'parquet', **kwargs):
    """Partitioned sink (one file per block — resumable layout).

    ``format``: 'parquet' (default; pass ``partition_cols=['col']`` for
    hive-partitioned output readable back with selective directory
    reads), 'json'/'jsonl' (one JSON object per line, the reference's
    native document format), or 'csv'."""
    if format in ('json', 'jsonl', 'ndjson'):
        ds.write_json(path, **kwargs)
    elif format == 'csv':
        ds.write_csv(path, **kwargs)
    elif format == 'parquet':
        ds.write_parquet(path, **kwargs)
    else:
        raise ValueError('unknown format {!r}'.format(format))
    return path
