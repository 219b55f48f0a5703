"""Semi/anti join modes (SQL EXISTS / NOT EXISTS) on both join paths.

Pinned against a pandas reference including the null-key conventions:
null keys never match, so semi drops them and anti keeps them; duplicate
right-side keys neither duplicate nor drop left rows."""

import numpy as np
import pandas as pd
import ray.data


def _frames():
    left = pd.DataFrame({
        'k': pd.array([1, 2, 2, 3, None, 7, 8], dtype='Int64'),
        'v': list('abcdefg'),
    })
    right = pd.DataFrame({
        'rk': pd.array([2, 2, 3, 5, None], dtype='Int64'),
        'payload': list('vwxyz'),
    })
    exists = {2, 3}
    semi = left[left['k'].isin(exists)]
    anti = left[~left['k'].isin(exists)]          # keeps the null-key row
    return left, right, semi, anti


def _check(out, want):
    got = out.to_pandas().sort_values('v')
    assert got['v'].tolist() == sorted(want['v'].tolist())
    assert list(got.columns) == ['k', 'v']


def test_broadcast_semi_anti(ray_session):
    from python_fastjsonschema_ray.stages.join import broadcast_lookup_join
    left, right, semi, anti = _frames()
    lds = ray.data.from_pandas(left).repartition(3)
    rds = ray.data.from_pandas(right)
    _check(broadcast_lookup_join(lds, 'k', rds, 'rk', how='semi'), semi)
    _check(broadcast_lookup_join(lds, 'k', rds, 'rk', how='anti'), anti)


def test_shuffle_semi_anti(ray_session):
    from python_fastjsonschema_ray.stages.join import shuffle_join
    left, right, semi, anti = _frames()
    lds = ray.data.from_pandas(left).repartition(3)
    rds = ray.data.from_pandas(right).repartition(2)
    _check(shuffle_join(lds, rds, 'k', 'rk', [], how='semi'), semi)
    _check(shuffle_join(lds, rds, 'k', 'rk', [], how='anti'), anti)


def test_shuffle_semi_anti_large_random(ray_session):
    from python_fastjsonschema_ray.stages.join import shuffle_join
    rng = np.random.default_rng(3)
    left = pd.DataFrame({'k': rng.integers(0, 200, 3000).astype('int64'),
                         'i': np.arange(3000, dtype='int64')})
    right = pd.DataFrame(
        {'rk': rng.integers(100, 300, 500).astype('int64')})
    exists = set(right['rk'])
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(4)
    got = shuffle_join(lds, rds, 'k', 'rk', [], how='semi').to_pandas()
    assert set(got['i']) == set(left[left['k'].isin(exists)]['i'])
    got = shuffle_join(lds, rds, 'k', 'rk', [], how='anti').to_pandas()
    assert set(got['i']) == set(left[~left['k'].isin(exists)]['i'])
