"""Ordered per-key scan operators (SQL window functions of the
``PARTITION BY key ORDER BY order`` family): running sum, row number,
lag / delta, and rolling mean over the last N rows.

The reference engine has no ordered analytics at all (it validates one
document at a time); these are the window primitives a training-data
pipeline needs on event logs — per-user running totals, inter-event
deltas, smoothing — expressed Ray-Data-first:

* rows exchange ONCE as ``(key, order, value)`` triples on a coarse
  hash bucket of the key (the minimum movement any exact ordered
  per-key scan needs — every row's result depends on all earlier rows
  of its key, so the key's rows must co-locate);
* each bucket handles ALL its keys with ONE mergesort +
  segment-vectorized kernels (cumsum / shift / cumcount) — no
  per-group Python, so millions of tiny keys cost the same as a few
  big ones;
* a pathologically hot key (one key ≫ bucket memory) needs the
  transpose: range-partition that key's rows on the order column and
  carry per-chunk offsets forward — not implemented here; windows.py's
  salted aggregates cover the unordered flavors.

Frame semantics are SQL ``ROWS`` (not ``RANGE``): ties on the order
columns are broken by the later order columns you pass, so pass enough
columns to make the order unique per key or results are
implementation-defined on the tied rows (exactly as in SQL).  Null
handling: null ``value`` rows propagate NaN through cumsum/lag (pandas
semantics); filter them first for SQL-NULL-skipping aggregates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCAN_OPS = ('row_number', 'cumsum', 'lag', 'delta', 'rolling_mean')


def grouped_scan(ds, keys, order_by, value_column,
                 ops=('row_number', 'cumsum'), *, window=None,
                 num_buckets=None, coalesce=True):
    """Per-key ordered scans over ``value_column``.

    Output: the input rows (columns ``keys + order_by + [value_column]``)
    with one extra column per op:

    - ``row_number`` — 1-indexed position within the key (int64);
    - ``cumsum`` — running sum, rows-unbounded-preceding (float64);
    - ``lag`` — previous row's value within the key, null on the first
      row (float64);
    - ``delta`` — ``value - lag`` (float64);
    - ``rolling_mean`` — mean of the last ``window`` rows including the
      current one, partial windows averaged over the rows seen so far
      (SQL ``AVG OVER (... ROWS BETWEEN window-1 PRECEDING AND CURRENT
      ROW)``); requires ``window``.

    Row order of the output is unspecified (Ray blocks); the scan
    order is ``order_by`` within each key.
    """
    import pandas as pd

    from ..pipelines.constraints import _AddKeyBucket, _default_buckets

    keys = list(keys)
    order_by = list(order_by)
    ops = tuple(ops)
    for op in ops:
        if op not in SCAN_OPS:
            raise ValueError('unknown scan op {!r}'.format(op))
    if 'rolling_mean' in ops and not (window and window >= 1):
        raise ValueError('rolling_mean requires window >= 1')
    num_buckets = num_buckets or _default_buckets()

    in_cols = keys + order_by + [value_column]
    ds_schema = ds.schema()
    if ds_schema is None:
        return ds              # fully-empty input: nothing to scan
    ds_types = dict(zip(ds_schema.names, ds_schema.types))
    op_fields = [pa.field(op, pa.int64() if op == 'row_number'
                          else pa.float64()) for op in ops]
    out_schema = pa.schema(
        [pa.field(c, ds_types[c]) for c in in_cols] + op_fields)

    narrow = ds.select_columns(in_cols)
    if coalesce:
        # Sort-shuffle fixed cost is task-count-driven; collapse the
        # many small read blocks before the bucket exchange.
        narrow = narrow.repartition(max(num_buckets // 8, 1))
    bucketed = narrow.map_batches(_AddKeyBucket(keys, num_buckets),
                                  batch_format='pyarrow')

    def bucket_scan(group: pa.Table) -> pa.Table:
        df = group.select(in_cols).to_pandas()
        if not len(df):
            return out_schema.empty_table()
        srt = df.sort_values(keys + order_by, kind='mergesort')
        g = srt.groupby(keys, sort=False, dropna=False)
        pos = g.cumcount().to_numpy()
        vals = srt[value_column].to_numpy(dtype=np.float64, na_value=np.nan)
        for op in ops:
            if op == 'row_number':
                srt[op] = pos + 1
            elif op == 'cumsum':
                srt[op] = g[value_column].cumsum().astype(np.float64)
            elif op in ('lag', 'delta'):
                # Groups are contiguous after the sort: the previous row
                # is in-group exactly when pos >= 1.
                prev = np.concatenate(([np.nan], vals[:-1]))
                prev[pos == 0] = np.nan
                srt[op] = prev if op == 'lag' else vals - prev
            elif op == 'rolling_mean':
                cs = g[value_column].cumsum().to_numpy(dtype=np.float64)
                w = int(window)
                if len(cs) > w:
                    back = np.concatenate((np.zeros(w), cs[:-w]))
                else:
                    back = np.zeros(len(cs))
                # pos >= w guarantees the row w places back is the same
                # key (contiguous groups), so cs[i] - cs[i-w] is the
                # exact last-w sum; younger rows average from the start.
                rsum = np.where(pos >= w, cs - back, cs)
                srt[op] = rsum / np.minimum(pos + 1, w)
        return pa.Table.from_pandas(srt[in_cols + list(ops)],
                                    schema=out_schema,
                                    preserve_index=False
                                    ).replace_schema_metadata(None)

    return bucketed.groupby('_bucket').map_groups(
        bucket_scan, batch_format='pyarrow')


def global_rank(ds, order_columns, *, descending=False,
                rank_column='rank'):
    """GLOBAL dense ordering: ``ROW_NUMBER() OVER (ORDER BY ...)`` —
    every row stamped with its 1-indexed position in the total order
    (pass enough ``order_columns`` to make the order unique or the
    ranks on tied rows are implementation-defined, exactly as in SQL).

    Two phases, the ``packing_plan`` discipline (stages/pack.py:30):
    ``Dataset.sort`` range-partitions into globally ordered blocks (the
    one unavoidable all-to-all — any exact total order pays it), then a
    counts-only fold reaches the driver (one int per block) and each
    block stamps ``offset + arange`` independently.  Row payloads cross
    the wire once, in the sort."""
    import ray
    import ray.data

    sorted_ds = ds.sort(list(order_columns),
                        descending=descending).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def nrows(t) -> int:
        return t.num_rows if isinstance(t, pa.Table) else len(t)

    counts = ray.get([nrows.remote(r) for r in refs])
    offsets = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])

    @ray.remote
    def stamp(t, offset: int):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t)
        ranks = np.arange(offset + 1, offset + 1 + t.num_rows,
                          dtype=np.int64)
        return t.append_column(rank_column,
                               pa.array(ranks, type=pa.int64()))

    return ray.data.from_arrow_refs(
        [stamp.remote(r, int(o)) for r, o in zip(refs, offsets)])
