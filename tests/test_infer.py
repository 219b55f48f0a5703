"""Schema inference: profile rows vs DuckDB, and the inferred spec
round-trips through the validator (the data it was inferred from
validates clean; out-of-range rows do not)."""

import pyarrow as pa


def test_profile_columns_nulls_and_bounds(ray_session):
    import ray.data
    from python_fastjsonschema_ray.pipelines.infer import profile_columns
    t = pa.table({
        'i': pa.array([3, None, 7, 5], type=pa.int64()),
        's': pa.array(['ab', 'xyz', None, ''], type=pa.string()),
        'f': pa.array([1.5, 2.5, 3.5, 4.5], type=pa.float64())})
    rows = {r['column']: r for r in profile_columns(
        ray.data.from_arrow(t).repartition(2))}
    assert rows['i'] == {'column': 'i', 'type': 'integer', 'nullable': True,
                         'min': 3.0, 'max': 7.0,
                         'min_length': None, 'max_length': None}
    assert rows['s']['nullable'] is True
    assert (rows['s']['min_length'], rows['s']['max_length']) == (0, 3)
    assert rows['s']['min'] is None and rows['s']['max'] is None
    assert rows['f'] == {'column': 'f', 'type': 'number', 'nullable': False,
                         'min': 1.5, 'max': 4.5,
                         'min_length': None, 'max_length': None}


def test_infer_table_spec_roundtrip(ray_session):
    """The inferred spec validates its own source data clean and flags
    rows outside the observed bounds."""
    import ray.data
    from python_fastjsonschema_ray.pipelines.infer import infer_table_spec
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    t = pa.table({
        'id': pa.array([1, 2, 3], type=pa.int64()),
        'name': pa.array(['aa', 'bbb', 'c'], type=pa.string())})
    ds = ray.data.from_arrow(t)
    spec = infer_table_spec(ds)
    assert spec['properties']['id'] == {
        'type': 'integer', 'minimum': 1, 'maximum': 3}
    assert spec['properties']['name'] == {
        'type': 'string', 'minLength': 1, 'maxLength': 3}
    assert sorted(spec['required']) == ['id', 'name']
    clean = validate_dataset(ds, spec, mode='violations',
                             key_column='id')
    assert clean.count() == 0
    bad = ray.data.from_arrow(pa.table({
        'id': pa.array([0, 2], type=pa.int64()),
        'name': pa.array(['ok', 'toolong!'], type=pa.string())}))
    viol = validate_dataset(bad, spec, mode='violations',
                            key_column='id').to_pandas()
    assert set(viol['rule']) == {'minimum', 'maxLength'}
