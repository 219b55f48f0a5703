"""Exact distributed quantiles by iterative histogram narrowing.

t-digest (``state/sketches.py``) answers approximate quantiles in one
pass; this operator answers EXACT order statistics without any shuffle:

1. one partial-stats pass → non-null count n, global [lo, hi];
2. repeat: a vectorized per-block histogram over [lo, hi] (``bins``
   buckets, np.searchsorted; each block emits one small count vector,
   the driver folds them) → descend into the bucket containing the
   target rank;
3. when ≤ ``collect_limit`` candidates remain in [lo, hi], collect just
   those VALUES and select the rank with one ``np.partition``.

Passes are full column re-scans (the dataset is never materialized), so
cost is O(log_bins(n / collect_limit) + 2) streaming scans — 3-4 scans
even at 10^12 rows with the defaults — each scan column-pruned and
embarrassingly parallel.  Heavy duplicate mass cannot stall the
narrowing: when the range collapses to a single float the answer is
that value.
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


def select_rank(ds, column, rank, *, bins=4096, collect_limit=500_000,
                max_iters=64):
    """The ``rank``-th smallest non-null value (0-indexed) of a numeric
    column, exactly."""
    n, lo, hi = _count_min_max(ds, column)
    if n == 0:
        return None
    if not 0 <= rank < n:
        raise ValueError('rank {} out of range for {} values'.format(rank, n))
    remaining, r = n, rank

    for _ in range(max_iters):
        if remaining <= collect_limit or lo == hi:
            break
        edges = np.linspace(lo, hi, bins + 1)

        def hist(batch: pa.Table, edges=edges) -> pa.Table:
            vals = np.asarray(batch.column(column).drop_null(),
                              dtype=np.float64)
            vals = vals[(vals >= edges[0]) & (vals <= edges[-1])]
            # Bucket i covers [edges[i], edges[i+1]); the last bucket is
            # closed on the right so `hi` itself is counted.
            idx = np.minimum(np.searchsorted(edges, vals, side='right') - 1,
                             len(edges) - 2)
            counts = np.bincount(idx, minlength=len(edges) - 1)
            return pa.table({'counts': pa.array([counts.tolist()])})

        folded = np.zeros(bins, dtype=np.int64)
        for t in _fold_refs(ds.map_batches(hist, batch_format='pyarrow')):
            for row in t.column('counts').to_pylist():
                folded += np.asarray(row, dtype=np.int64)
        cum = np.cumsum(folded)
        b = int(np.searchsorted(cum, r + 1))
        r -= int(cum[b - 1]) if b else 0
        new_lo, new_hi = float(edges[b]), float(edges[b + 1])
        new_remaining = int(folded[b])
        if new_remaining == remaining and (new_lo, new_hi) == (lo, hi):
            break       # cannot narrow further (degenerate float range)
        lo, hi, remaining = new_lo, new_hi, new_remaining
        # All but the last bucket are right-open; the selected value
        # still lies in [lo, hi] because bucket b's values were counted
        # with exactly those bounds below.

    if lo == hi:
        return float(lo)

    # Final collect uses the CLOSED range: values equal to `hi` may
    # belong to the parent's next bucket, but they sort after every
    # true in-range value and r < (true in-range count), so the r-th
    # smallest of the union is still the target.  (The same argument
    # keeps the per-iteration closed-range histograms exact.)
    def collect(batch: pa.Table) -> pa.Table:
        vals = np.asarray(batch.column(column).drop_null(),
                          dtype=np.float64)
        vals = vals[(vals >= lo) & (vals <= hi)]
        return pa.table({'v': pa.array(vals, type=pa.float64())})

    parts = _fold_refs(ds.map_batches(collect, batch_format='pyarrow'))
    vals = (np.concatenate([np.asarray(t.column('v')) for t in parts])
            if parts else np.empty(0))
    vals.partition(r)
    return float(vals[r])


def exact_quantile(ds, column, q, **kwargs):
    """Exact ``quantile_disc`` semantics (DuckDB/Postgres discrete
    quantile): the element at 0-indexed rank ``max(ceil(n*q)-1, 0)``
    among the sorted non-null values."""
    n, _, _ = _count_min_max(ds, column)
    if n == 0:
        return None
    rank = max(int(math.ceil(n * q)) - 1, 0)
    return select_rank(ds, column, rank, **kwargs)
