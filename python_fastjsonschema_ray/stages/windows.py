"""Stream-shaped operators over ordered event tables.

Ray Data has no event-time windowing; per the engine design the events
table is treated as a partitioned log: window membership is computed
vectorized per batch, partially aggregated inside the batch (combiner),
and the (key, window) partials fold through ``grouped_agg``'s
coarse-bucket combine — the shuffle moves one row per (key, window) per
block, not per event, and the Ray-level group count stays O(cluster)
instead of O(keys x windows).

Session windows need the full per-key timeline: keys co-locate on a
coarse hash bucket and every key in a bucket sessionizes in one
vectorized pass (documented partitioning assumption: one key's history
fits one bucket group / worker).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class _TumblingPartialStage:
    def __init__(self, ts_column, key_column, value_column, window_s):
        self.ts_column = ts_column
        self.key_column = key_column
        self.value_column = value_column
        self.window_us = int(window_s * 1_000_000)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = batch.column(self.ts_column).combine_chunks().cast(pa.int64())
        bucket = pc.divide(ts, self.window_us)
        sub = pa.table({
            self.key_column: batch.column(self.key_column),
            'window': bucket,
            self.value_column: batch.column(self.value_column),
        })
        grouped = sub.group_by([self.key_column, 'window']).aggregate([
            (self.value_column, 'sum'), (self.value_column, 'count')])
        return grouped.rename_columns(
            [self.key_column, 'window', 'partial_sum', 'partial_n'])


def tumbling_window_agg(ds, ts_column, key_column, value_column, window_s,
                        concurrency=None):
    """Tumbling-window count/sum per key: returns
    (key, window:int64 epoch-bucket, n, sum_value)."""
    from ..pipelines.constraints import grouped_agg

    kwargs = {'batch_format': 'pyarrow'}
    if concurrency:
        kwargs['concurrency'] = concurrency
    partials = ds.map_batches(
        _TumblingPartialStage(ts_column, key_column, value_column, window_s),
        **kwargs)
    # (key, window) cardinality is users x windows — far too many groups
    # for the raw sort-aggregate (~0.5 ms/group); fold partials through
    # the coarse-bucket combine instead.
    return grouped_agg(partials, [key_column, 'window'],
                       {'n': ('partial_n', 'sum'),
                        'sum_value': ('partial_sum', 'sum')},
                       combine='bucket')


def sliding_window_agg(ds, ts_column, key_column, value_column, window_s,
                       slide_s, concurrency=None):
    """Sliding windows as window_s/slide_s overlapping tumbling replicas:
    each event contributes to ceil(window/slide) buckets (flat_map-style
    expansion inside the partial stage)."""
    from ..pipelines.constraints import grouped_agg

    replicas = int(np.ceil(window_s / slide_s))
    slide_us = int(slide_s * 1_000_000)
    window_us = int(window_s * 1_000_000)

    def expand(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch.column(ts_column).combine_chunks()
                        .cast(pa.int64()))
        keys = batch.column(key_column)
        vals = batch.column(value_column)
        frames = []
        for r in range(replicas):
            start = ((ts - r * slide_us) // window_us) * window_us \
                + r * slide_us
            keep = ts >= start
            frames.append(pa.table({
                key_column: keys.filter(pa.array(keep)),
                'window_start': pa.array(start[keep], type=pa.int64()),
                value_column: vals.filter(pa.array(keep)),
            }))
        merged = pa.concat_tables(frames)
        grouped = merged.group_by([key_column, 'window_start']).aggregate([
            (value_column, 'sum'), (value_column, 'count')])
        return grouped.rename_columns(
            [key_column, 'window_start', 'partial_sum', 'partial_n'])

    kwargs = {'batch_format': 'pyarrow'}
    if concurrency:
        kwargs['concurrency'] = concurrency
    partials = ds.map_batches(expand, **kwargs)
    return grouped_agg(partials, [key_column, 'window_start'],
                       {'n': ('partial_n', 'sum'),
                        'sum_value': ('partial_sum', 'sum')},
                       combine='bucket')


def session_windows(ds, ts_column, key_column, gap_s, concurrency=None,
                    num_buckets=None):
    """Session windows (gap-based).  Returns
    (key, session_start, session_end, n).

    Keys are high-cardinality (users), so a raw ``groupby(key)`` would
    pay the per-distinct-key sort-aggregate cost; instead each key's
    full history co-locates on a COARSE hash bucket of the key and ALL
    keys in a bucket sessionize in one vectorized pass: sort by
    (key, ts), session breaks where the key changes or the gap is
    exceeded, one reduceat-free segment fold.  Partitioning assumption
    (documented): one key's events fit one bucket group — true whenever
    per-key history fits a worker, the same bound the per-key variant
    had."""
    from ..pipelines.constraints import _AddKeyBucket, _default_buckets

    gap_us = int(gap_s * 1_000_000)

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values([key_column, ts_column])
        # Unit-robust: normalize whatever datetime64 unit pandas delivered
        # to microseconds (Arrow timestamp[us] epoch).
        ts = g[ts_column].to_numpy().astype('datetime64[us]').astype('int64')
        keys = g[key_column].to_numpy()
        if not len(ts):
            return pd.DataFrame({key_column: keys[:0],
                                 'session_start': ts[:0],
                                 'session_end': ts[:0],
                                 'n': np.array([], dtype=np.int64)})
        new_key = np.empty(len(ts), dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        gap_break = np.empty(len(ts), dtype=bool)
        gap_break[0] = False
        gap_break[1:] = np.diff(ts) > gap_us
        starts = np.flatnonzero(new_key | gap_break)
        ends = np.concatenate([starts[1:], [len(ts)]])
        return pd.DataFrame({
            key_column: keys[starts],
            'session_start': ts[starts],
            'session_end': ts[ends - 1],
            'n': ends - starts,
        })

    bucketed = ds.map_batches(
        _AddKeyBucket([key_column], num_buckets or _default_buckets()),
        batch_format='pyarrow')

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return sessions(group.drop(columns=['_bucket']))

    return bucketed.groupby('_bucket').map_groups(
        per_bucket, batch_format='pandas')
