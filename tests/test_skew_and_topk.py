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
