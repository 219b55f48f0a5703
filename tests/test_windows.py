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
