"""Skew-salted aggregation + top-k violation examples."""

import numpy as np
import pytest


def test_salted_group_agg_matches_plain(ray_session):
    import ray.data
    from python_fastjsonschema_ray.pipelines.constraints import salted_group_agg
    ds = ray.data.read_parquet('/root/testdata/sf0.001/lineitem.parquet',
                               columns=['l_returnflag', 'l_quantity'])
    out = salted_group_agg(ds, ['l_returnflag'], 'l_quantity').to_pandas()
    df = ds.to_pandas()
    expected = df.groupby('l_returnflag').agg(
        sum_value=('l_quantity', 'sum'), n=('l_quantity', 'size'))
    for _, row in out.iterrows():
        exp = expected.loc[row['l_returnflag']]
        assert row['n'] == exp['n']
        assert np.isclose(row['sum_value'], exp['sum_value'])


def test_top_violation_examples(ray_session):
    import ray.data
    from python_fastjsonschema_ray.pipelines.validate import (
        top_violation_examples, validate_dataset)
    ds = ray.data.read_parquet('/root/testdata/sf0.001/lineitem.parquet',
                               columns=['l_orderkey', 'l_quantity',
                                        'l_discount'])
    spec = {'properties': {
        'l_quantity': {'maximum': 40},
        'l_discount': {'maximum': 0.05},
    }}
    violations = validate_dataset(ds, spec, mode='violations',
                                  key_column='l_orderkey', fast_fail=False)
    top = top_violation_examples(violations, k=3).to_pandas()
    counts = top.groupby('rule').size()
    assert (counts <= 3).all()
    assert counts.get('maximum', 0) == 3


def test_pivot_table_count_and_sum(ray_session):
    """Pivot cells equal pandas' own pivot on the same data; fill
    applies to absent (index, pivot) pairs; sum aggregates values."""
    import numpy as np
    import pandas as pd
    import ray.data
    from python_fastjsonschema_ray.pipelines.constraints import pivot_table

    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        'grp': rng.choice(['a', 'b', 'c'], 300),
        'status': rng.choice(['X', 'Y'], 300),
        'v': rng.integers(1, 10, 300).astype('int64'),
    })
    df = df[~((df.grp == 'c') & (df.status == 'Y'))]    # a hole
    ds = ray.data.from_pandas(df).repartition(5)

    got = pivot_table(ds, ['grp'], 'status').sort_values('grp') \
        .reset_index(drop=True)
    want = df.pivot_table(index='grp', columns='status', values='v',
                          aggfunc='count', fill_value=0) \
        .reset_index().rename_axis(None, axis=1)
    assert got['X'].tolist() == want['X'].tolist()
    assert got['Y'].tolist() == want['Y'].tolist()
    assert got.loc[got.grp == 'c', 'Y'].iloc[0] == 0    # hole filled

    got = pivot_table(ds, ['grp'], 'status', 'v', agg='sum') \
        .sort_values('grp').reset_index(drop=True)
    want = df.pivot_table(index='grp', columns='status', values='v',
                          aggfunc='sum', fill_value=0).reset_index()
    assert got['X'].tolist() == want['X'].tolist()
