"""Exact distributed quantiles by iterative histogram narrowing.

t-digest (``state/sketches.py``) answers approximate quantiles in one
pass; this operator answers EXACT order statistics without any shuffle:

1. one partial-stats pass → non-null count n, global [lo, hi];
2. repeat: a vectorized per-block histogram over [lo, hi] (``bins``
   buckets, np.searchsorted; each block emits one small count vector,
   the driver folds them) → descend into the bucket containing the
   target rank;
3. when ≤ ``collect_limit`` candidates remain in [lo, hi] — or the
   range has stalled at ULP scale under duplicate mass — collect the
   per-block (unique value, count) pairs in that range and resolve the
   rank arithmetically on the driver.

Passes are full column re-scans (the dataset is never materialized), so
cost is O(log_bins(n / collect_limit) + 2) streaming scans — 3-4 scans
even at 10^12 rows with the defaults — each scan column-pruned and
embarrassingly parallel.  Heavy duplicate mass can stop the range
SHRINKING (adjacent floats both carrying billions of rows), but the
final pass folds (unique, count) pairs — O(distinct floats in range),
never O(rows) — so a stalled state cannot blow up driver memory.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _fold_refs(ds_out):
    """Collect tiny per-block partial rows without driver-side Dataset
    materialization helpers (ObjectRefs → list of arrow tables)."""
    import ray
    tables = []
    for t in ray.get(ds_out.to_arrow_refs()):
        if not isinstance(t, pa.Table):
            t = pa.Table.from_pandas(t)
        if t.num_rows:
            tables.append(t)
    return tables


def _count_min_max(ds, column):
    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(column)
        vals = np.asarray(arr.drop_null(), dtype=np.float64)
        # NaN is skipped like null (the SQL aggregate convention);
        # left in, it poisons min/max and is invisible to the range
        # masks of every later narrowing pass, stalling the search.
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return pa.table({'n': pa.array([0], pa.int64()),
                             'lo': pa.array([None], pa.float64()),
                             'hi': pa.array([None], pa.float64())})
        return pa.table({'n': pa.array([len(vals)], pa.int64()),
                         'lo': pa.array([float(vals.min())], pa.float64()),
                         'hi': pa.array([float(vals.max())], pa.float64())})

    tables = _fold_refs(ds.map_batches(partial, batch_format='pyarrow'))
    n, lo, hi = 0, math.inf, -math.inf
    for t in tables:
        n += int(np.asarray(t.column('n')).sum())
        los = np.asarray(t.column('lo').drop_null(), dtype=np.float64)
        his = np.asarray(t.column('hi').drop_null(), dtype=np.float64)
        if len(los):
            lo = min(lo, float(los.min()))
        if len(his):
            hi = max(hi, float(his.max()))
    return n, lo, hi


def select_ranks(ds, column, ranks, *, bins=4096, collect_limit=500_000,
                 max_iters=64, _stats=None):
    """The ``ranks[i]``-th smallest non-null values (0-indexed),
    exactly, SHARING every streaming pass across all ranks: one
    count/min/max scan, then each narrowing iteration computes every
    active rank's histogram in the same ``map_batches`` sweep (k small
    count vectors per block instead of k full re-scans), and one final
    collect pass gathers every still-open range at once.  Asking for
    p05 and p95 together costs the same scans as asking for one."""
    import ray  # noqa: F401  (parallelism comes from ds.map_batches)

    ranks = list(ranks)
    n, lo0, hi0 = _stats if _stats is not None else _count_min_max(ds, column)
    if n == 0:
        return [None] * len(ranks)
    for r in ranks:
        if not 0 <= r < n:
            raise ValueError(
                'rank {} out of range for {} values'.format(r, n))
    states = [{'r': r, 'lo': lo0, 'hi': hi0, 'remaining': n,
               'stalled': False, 'val': None} for r in ranks]

    def open_states():
        return [s for s in states if s['val'] is None and not s['stalled']
                and s['remaining'] > collect_limit and s['lo'] != s['hi']]

    for _ in range(max_iters):
        active = open_states()
        if not active:
            break
        edges_list = [np.linspace(s['lo'], s['hi'], bins + 1)
                      for s in active]

        def hist(batch: pa.Table, edges_list=edges_list) -> pa.Table:
            vals_all = np.asarray(batch.column(column).drop_null(),
                                  dtype=np.float64)
            rows = []
            for edges in edges_list:
                vals = vals_all[(vals_all >= edges[0])
                                & (vals_all <= edges[-1])]
                # Bucket i covers [edges[i], edges[i+1]); the last
                # bucket is closed on the right so `hi` is counted.
                idx = np.minimum(
                    np.searchsorted(edges, vals, side='right') - 1,
                    len(edges) - 2)
                rows.append(np.bincount(idx,
                                        minlength=len(edges) - 1).tolist())
            return pa.table({'counts': pa.array([rows])})

        folded = [np.zeros(bins, dtype=np.int64) for _ in active]
        for t in _fold_refs(ds.map_batches(hist, batch_format='pyarrow')):
            for block_rows in t.column('counts').to_pylist():
                for i, row in enumerate(block_rows):
                    folded[i] += np.asarray(row, dtype=np.int64)
        for s, edges, counts in zip(active, edges_list, folded):
            cum = np.cumsum(counts)
            b = int(np.searchsorted(cum, s['r'] + 1))
            new_lo, new_hi = float(edges[b]), float(edges[b + 1])
            new_remaining = int(counts[b])
            if (new_remaining == s['remaining']
                    and (new_lo, new_hi) == (s['lo'], s['hi'])):
                s['stalled'] = True      # degenerate float range
                continue
            s['r'] -= int(cum[b - 1]) if b else 0
            s['lo'], s['hi'], s['remaining'] = new_lo, new_hi, new_remaining

    for s in states:
        if s['lo'] == s['hi']:
            s['val'] = float(s['lo'])

    pending = [s for s in states if s['val'] is None]
    if pending:
        # One collect pass for ALL still-open ranges.  Each uses its
        # CLOSED range: values equal to `hi` may belong to the parent's
        # next bucket, but they sort after every true in-range value
        # and r < (true in-range count), so the r-th smallest of the
        # union is still the target.
        bounds = [(s['lo'], s['hi']) for s in pending]

        def collect(batch: pa.Table, bounds=bounds) -> pa.Table:
            # Emit per-block (unique value, count) pairs, NOT raw
            # values: a 'stalled' state (range narrowed to adjacent
            # floats with heavy duplicate mass) can hold billions of
            # remaining ROWS but only a handful of distinct FLOATS, so
            # the driver-side fold stays O(distinct), never O(rows).
            vals_all = np.asarray(batch.column(column).drop_null(),
                                  dtype=np.float64)
            cols = {}
            for i, (lo, hi) in enumerate(bounds):
                sel = vals_all[(vals_all >= lo) & (vals_all <= hi)]
                u, c = np.unique(sel, return_counts=True)
                cols['v{}'.format(i)] = pa.array(u, type=pa.float64())
                cols['c{}'.format(i)] = pa.array(c, type=pa.int64())
            m = max((len(c) for c in cols.values()), default=0)
            cols = {k: pa.concat_arrays(
                        [v, pa.nulls(m - len(v), v.type)])
                    for k, v in cols.items()}
            return pa.table(cols)

        parts = _fold_refs(ds.map_batches(collect, batch_format='pyarrow'))
        for i, s in enumerate(pending):
            us, cs = [], []
            for t in parts:
                # v/c columns share one validity layout (padded from
                # equal unpadded lengths), so independent drop_null
                # stays aligned.
                us.append(np.asarray(
                    t.column('v{}'.format(i)).drop_null(),
                    dtype=np.float64))
                cs.append(np.asarray(
                    t.column('c{}'.format(i)).drop_null(),
                    dtype=np.int64))
            u_all = np.concatenate(us) if us else np.empty(0)
            c_all = np.concatenate(cs) if cs else np.empty(0, np.int64)
            u, inv = np.unique(u_all, return_inverse=True)
            cnt = np.bincount(inv, weights=c_all.astype(np.float64),
                              minlength=len(u)).astype(np.int64)
            cum = np.cumsum(cnt)
            s['val'] = float(u[int(np.searchsorted(cum, s['r'] + 1))])
    return [s['val'] for s in states]


def select_rank(ds, column, rank, **kwargs):
    """The ``rank``-th smallest non-null value (0-indexed) of a numeric
    column, exactly."""
    return select_ranks(ds, column, [rank], **kwargs)[0]


def exact_quantiles(ds, column, qs, **kwargs):
    """Exact ``quantile_disc`` for several quantiles in shared passes:
    rank ``max(ceil(n*q)-1, 0)`` per q, one count scan + shared
    narrowing/collect sweeps (see :func:`select_ranks`)."""
    stats = _count_min_max(ds, column)
    n = stats[0]
    if n == 0:
        return [None] * len(list(qs))
    ranks = [max(int(math.ceil(n * q)) - 1, 0) for q in qs]
    return select_ranks(ds, column, ranks, _stats=stats, **kwargs)


def exact_quantile(ds, column, q, **kwargs):
    """Exact ``quantile_disc`` semantics (DuckDB/Postgres discrete
    quantile): the element at 0-indexed rank ``max(ceil(n*q)-1, 0)``
    among the sorted non-null values."""
    return exact_quantiles(ds, column, [q], **kwargs)[0]


def grouped_quantile(ds, keys, value_column, qs, *, num_buckets=None,
                     coalesce=True, out_column='value'):
    """Exact per-group discrete quantiles (``quantile_disc`` rank rule:
    0-indexed ``max(ceil(n*q)-1, 0)`` among each group's sorted non-null
    values).  Output: one row per (group, q) with columns
    ``keys + ['q', out_column]``; groups whose values are ALL null emit
    a null quantile (SQL aggregate convention).

    Scale: rows exchange ONCE as (key, value) pairs on a coarse hash
    bucket of the key — the minimum data movement any exact per-group
    order statistic needs when group count is large — and each bucket
    ranks all its groups with ONE vectorized sort + cumcount pass (no
    per-group Python).  For a FEW huge groups the transpose is cheaper:
    run :func:`exact_quantile` per group filter (histogram narrowing,
    no shuffle at all).  Skewed keys concentrate in one bucket; at
    10^9+ rows per hot key prefer the per-group narrowing path."""
    import pandas as pd

    from ..pipelines.constraints import _AddKeyBucket, _default_buckets

    keys = list(keys)
    qs = [float(q) for q in qs]
    num_buckets = num_buckets or _default_buckets()

    ds_schema = ds.schema()
    if ds_schema is None:
        return ds              # fully-empty input: no groups, no rows
    ds_types = dict(zip(ds_schema.names, ds_schema.types))
    out_schema = pa.schema(
        [pa.field(k, ds_types[k]) for k in keys] +
        [pa.field('q', pa.float64()),
         pa.field(out_column, ds_types[value_column])])

    narrow = ds.select_columns(keys + [value_column])
    if coalesce:
        # Sort-shuffle fixed cost is task-count-driven; collapse the
        # many small read blocks before the bucket exchange.
        narrow = narrow.repartition(max(num_buckets // 8, 1))
    bucketed = narrow.map_batches(_AddKeyBucket(keys, num_buckets),
                                  batch_format='pyarrow')

    def bucket_quantiles(group: pa.Table) -> pa.Table:
        df = group.select(keys + [value_column]).to_pandas()
        all_groups = df[keys].drop_duplicates()
        vals = df.dropna(subset=[value_column])
        out_parts = []
        if len(vals):
            srt = vals.sort_values(keys + [value_column], kind='mergesort')
            g = srt.groupby(keys, sort=False, dropna=False)
            pos = g.cumcount().to_numpy()
            n = g[value_column].transform('size').to_numpy()
            for q in qs:
                rank = np.maximum(np.ceil(n * q).astype(np.int64) - 1, 0)
                sel = srt[pos == rank].copy()
                sel['q'] = q
                out_parts.append(sel)
        if out_parts:
            out = pd.concat(out_parts, ignore_index=True, sort=False)
        else:
            out = df.iloc[:0].copy()
            out['q'] = pd.Series(dtype='float64')
        # Groups with only null values still exist in SQL GROUP BY:
        # emit a null quantile row per q for any group that vanished.
        seen = out[keys].drop_duplicates()
        missing = all_groups.merge(seen, on=keys, how='left',
                                   indicator=True)
        missing = missing[missing['_merge'] == 'left_only'][keys]
        if len(missing):
            pads = []
            for q in qs:
                pad = missing.copy()
                pad['q'] = q
                pad[value_column] = None
                pads.append(pad)
            out = pd.concat([out] + pads, ignore_index=True, sort=False)
        out = out[keys + ['q', value_column]].rename(
            columns={value_column: out_column})
        # replace_schema_metadata(None): from_pandas attaches b'pandas'
        # metadata even with schema=, and this pyarrow build's Schema
        # hash chokes on it inside Ray's block-schema dedup.
        return pa.Table.from_pandas(out, schema=out_schema,
                                    preserve_index=False
                                    ).replace_schema_metadata(None)

    return bucketed.groupby('_bucket').map_groups(
        bucket_quantiles, batch_format='pyarrow')
