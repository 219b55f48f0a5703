"""Z-score standardization vs numpy / DuckDB window semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df, blocks=3):
    import ray.data
    return ray.data.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)).repartition(blocks)


def test_standardize_matches_numpy(ray_session):
    from python_fastjsonschema_ray.stages.scale import (
        column_moments, standardize_columns)
    rng = np.random.default_rng(3)
    df = pd.DataFrame({'id': np.arange(2000),
                       'a': rng.normal(50, 7, 2000),
                       'b': rng.exponential(3, 2000)})
    stats = column_moments(_ds(df), ['a', 'b'])
    for c in ['a', 'b']:
        n, mean, std = stats[c]
        assert n == 2000
        assert abs(mean - df[c].mean()) < 1e-9
        assert abs(std - df[c].std(ddof=1)) < 1e-9
    out = standardize_columns(_ds(df), ['a', 'b']).to_pandas() \
        .sort_values('id')
    for c in ['a', 'b']:
        exp = (df[c] - df[c].mean()) / df[c].std(ddof=1)
        np.testing.assert_allclose(out[c + '_z'].to_numpy(),
                                   exp.to_numpy(), atol=1e-9)
        assert abs(out[c + '_z'].mean()) < 1e-9
        assert abs(out[c + '_z'].std(ddof=1) - 1.0) < 1e-9


def test_standardize_nulls_and_constant(ray_session):
    from python_fastjsonschema_ray.stages.scale import standardize_columns
    df = pd.DataFrame({'id': [0, 1, 2, 3],
                       'x': [1.0, None, 3.0, None],
                       'c': [5.0, 5.0, 5.0, 5.0]})
    out = standardize_columns(_ds(df, blocks=2), ['x', 'c']).to_pandas() \
        .sort_values('id')
    # Nulls excluded from moments: mean=2, std=sqrt(2); nulls stay null.
    got = out['x_z'].to_numpy()
    np.testing.assert_allclose(got[[0, 2]],
                               [-1 / np.sqrt(2), 1 / np.sqrt(2)])
    assert np.isnan(got[[1, 3]]).all()
    # Zero variance standardizes to 0.0 by convention.
    assert (out['c_z'] == 0.0).all()


def test_standardize_reuse_train_stats(ray_session):
    """Validation split scaled with the train split's moments."""
    from python_fastjsonschema_ray.stages.scale import (
        column_moments, standardize_columns)
    train = pd.DataFrame({'id': range(100),
                          'x': np.linspace(0, 10, 100)})
    val = pd.DataFrame({'id': range(5), 'x': [0.0, 5.0, 10.0, 20.0, -5.0]})
    stats = column_moments(_ds(train), ['x'])
    out = standardize_columns(_ds(val, blocks=1), ['x'],
                              stats=stats).to_pandas().sort_values('id')
    mean, std = stats['x'][1], stats['x'][2]
    np.testing.assert_allclose(out['x_z'].to_numpy(),
                               (val['x'] - mean) / std, atol=1e-12)


def test_winsorize_matches_numpy(ray_session):
    """Clip bounds are the exact discrete quantiles; nulls stay null;
    precomputed bounds reuse skips the fold."""
    import numpy as np
    import pandas as pd
    import ray.data
    from python_fastjsonschema_ray.stages.scale import (
        column_quantile_bounds, winsorize_columns)

    rng = np.random.default_rng(9)
    vals = rng.normal(100, 25, 400).round(2)
    df = pd.DataFrame({'id': np.arange(400), 'v': vals})
    df.loc[5, 'v'] = None
    ds = ray.data.from_pandas(df).repartition(5)

    # Block emission order is not guaranteed under load — realign by id.
    out = winsorize_columns(ds, ['v'], lower_q=0.1, upper_q=0.9) \
        .to_pandas().sort_values('id').reset_index(drop=True)
    clean = np.sort(df['v'].dropna().to_numpy())
    n = len(clean)
    lo = clean[max(int(np.ceil(n * 0.1)) - 1, 0)]
    hi = clean[max(int(np.ceil(n * 0.9)) - 1, 0)]
    want = df['v'].clip(lo, hi)
    assert np.allclose(out['v_w'].to_numpy(), want.to_numpy(),
                       equal_nan=True)
    assert out['v_w'].isna().sum() == 1

    # train-stats reuse: apply the same bounds to a different dataset
    bounds = column_quantile_bounds(ds, ['v'], 0.1, 0.9)
    assert bounds['v'] == (lo, hi)
    other = ray.data.from_pandas(pd.DataFrame({'v': [0.0, 1000.0]}))
    reused = winsorize_columns(other, ['v'], bounds=bounds).to_pandas()
    assert reused['v_w'].tolist() == [lo, hi]


def test_standardize_constant_column_keeps_nulls(ray_session):
    """Zero-variance branch: present values -> 0.0 but nulls STAY null
    (module contract; a blanket zeros_like would zero the nulls)."""
    from python_fastjsonschema_ray.stages.scale import standardize_columns
    df = pd.DataFrame({'id': [0, 1, 2], 'c': [5.0, 5.0, None]})
    out = standardize_columns(_ds(df, blocks=2), ['c']).to_pandas() \
        .sort_values('id')
    got = out['c_z'].to_numpy()
    assert got[0] == 0.0 and got[1] == 0.0
    assert np.isnan(got[2])
