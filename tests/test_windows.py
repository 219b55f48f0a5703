"""Window aggregate unit tests vs pandas brute force."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope='module')
def events(ray_session):
    import ray.data
    return ray.data.read_parquet('/root/testdata/sf0.001/events.parquet',
                                 columns=['ts', 'event_type', 'user_id',
                                          'value'])


def test_tumbling_matches_pandas(events):
    from python_fastjsonschema_ray.stages.windows import tumbling_window_agg
    out = tumbling_window_agg(events, 'ts', 'event_type', 'value',
                              3600).to_pandas()
    df = events.to_pandas()
    df['window'] = df['ts'].to_numpy().astype('datetime64[us]') \
        .astype('int64') // (3600 * 1_000_000)
    expected = df.groupby(['event_type', 'window']).agg(
        n=('value', 'size'), sum_value=('value', 'sum')).reset_index()
    merged = out.merge(expected, on=['event_type', 'window'],
                       suffixes=('', '_exp'))
    assert len(merged) == len(expected) == len(out)
    assert (merged['n'] == merged['n_exp']).all()
    assert np.allclose(merged['sum_value'], merged['sum_value_exp'])


def test_sliding_matches_pandas(events):
    from python_fastjsonschema_ray.stages.windows import sliding_window_agg
    window_s, slide_s = 7200, 3600
    out = sliding_window_agg(events, 'ts', 'event_type', 'value',
                             window_s, slide_s).to_pandas()
    df = events.to_pandas()
    ts = df['ts'].to_numpy().astype('datetime64[us]').astype('int64')
    rows = []
    for r in range(window_s // slide_s):
        start = ((ts - r * slide_s * 1_000_000)
                 // (window_s * 1_000_000)) * (window_s * 1_000_000) \
            + r * slide_s * 1_000_000
        keep = ts >= start
        rows.append(pd.DataFrame({'event_type': df['event_type'][keep],
                                  'window_start': start[keep],
                                  'value': df['value'][keep]}))
    expected = pd.concat(rows).groupby(['event_type', 'window_start']).agg(
        n=('value', 'size'), sum_value=('value', 'sum')).reset_index()
    merged = out.merge(expected, on=['event_type', 'window_start'],
                       suffixes=('', '_exp'))
    assert len(merged) == len(expected) == len(out)
    assert (merged['n'] == merged['n_exp']).all()
    assert np.allclose(merged['sum_value'], merged['sum_value_exp'])
    # Every event lands in exactly window/slide windows.
    assert out['n'].sum() == len(df) * (window_s // slide_s)


def _pandas_sessions(df, gap_s):
    """Reference sessionization: global sort, key/gap breaks."""
    g = df.sort_values(['user_id', 'ts'])
    ts = g['ts'].to_numpy().astype('datetime64[us]').astype('int64')
    keys = g['user_id'].to_numpy()
    brk = np.empty(len(ts), dtype=bool)
    brk[0] = True
    brk[1:] = (keys[1:] != keys[:-1]) | (np.diff(ts) > gap_s * 1_000_000)
    seg = np.flatnonzero(brk)
    seg_end = np.concatenate([seg[1:], [len(ts)]])
    return pd.DataFrame({
        'user_id': keys[seg], 'session_start': ts[seg],
        'session_end': ts[seg_end - 1], 'n': seg_end - seg,
    }).sort_values(['user_id', 'session_start']).reset_index(drop=True)


def test_session_windows_matches_pandas(events):
    from python_fastjsonschema_ray.stages.windows import session_windows
    out = session_windows(events, 'ts', 'user_id', 1800).to_pandas() \
        .sort_values(['user_id', 'session_start']).reset_index(drop=True)
    expected = _pandas_sessions(events.to_pandas(), 1800)
    pd.testing.assert_frame_equal(
        out[expected.columns].astype(expected.dtypes.to_dict()), expected)


def test_session_windows_hot_key(ray_session):
    """Adversarial skew: ONE key holds 50% of all events.  The
    time-block salt must spread that key across many bucket groups (no
    group ever holds its full history — the bound that keeps a worker
    from OOMing at scale) while the merge pass still reproduces the
    exact global sessions, including sessions crossing block
    boundaries."""
    import pyarrow as pa
    import ray.data
    from python_fastjsonschema_ray.stages.windows import session_windows

    rng = np.random.default_rng(7)
    n = 20_000
    # Hot key: one event every 100 s (sessions merge across any block
    # cut, since gap_s=1800 > 100); cold keys: sparse independent.
    hot_ts = np.arange(n, dtype=np.int64) * 100_000_000
    cold_ts = rng.integers(0, hot_ts[-1], n).astype(np.int64)
    ts = np.concatenate([hot_ts, cold_ts])
    keys = np.concatenate([np.zeros(n, dtype=np.int64),
                           rng.integers(1, 500, n).astype(np.int64)])
    t = pa.table({'ts': pa.array(ts, type=pa.timestamp('us')),
                  'user_id': pa.array(keys)})
    ds = ray.data.from_arrow(t).repartition(16)
    gap_s, block_s = 1800, 3600    # ~556 blocks over the hot span
    out = session_windows(ds, 'ts', 'user_id', gap_s,
                          time_block_s=block_s).to_pandas() \
        .sort_values(['user_id', 'session_start']).reset_index(drop=True)
    df = pd.DataFrame({'ts': ts.astype('datetime64[us]'), 'user_id': keys})
    expected = _pandas_sessions(df, gap_s)
    pd.testing.assert_frame_equal(
        out[expected.columns].astype(expected.dtypes.to_dict()), expected)
    # The hot key's 20k continuous events collapse to ONE session even
    # though they were sessionized across ~556 separate time blocks.
    hot = out[out['user_id'] == 0]
    assert len(hot) == 1 and int(hot['n'].iloc[0]) == n
    # And the salt really splits the history: the per-group bound is
    # events-per-block, two orders of magnitude below the full history.
    per_block = np.unique(hot_ts // (block_s * 1_000_000)).size
    assert per_block > 100


def test_session_windows_time_block_guard(events):
    from python_fastjsonschema_ray.stages.windows import session_windows
    with pytest.raises(ValueError, match='time_block_s must exceed'):
        session_windows(events, 'ts', 'user_id', 1800, time_block_s=1800)
