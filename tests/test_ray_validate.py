"""Ray Data integration: validation stages over the driver-generated
testdata parquet (read → map_batches actor pool → verdicts/violations)."""

import pyarrow as pa
import pytest

SF_DIR = '/root/testdata/sf0.001'

LINEITEM_SPEC = {
    'type': 'object',
    'properties': {
        'l_orderkey': {'type': 'integer', 'minimum': 0},
        'l_quantity': {'type': 'number', 'minimum': 1, 'maximum': 50},
        'l_discount': {'type': 'number', 'minimum': 0, 'maximum': 0.1},
        'l_returnflag': {'enum': ['A', 'N', 'R']},
        'l_linestatus': {'enum': ['O', 'F']},
    },
    'required': ['l_orderkey', 'l_quantity'],
}


@pytest.fixture(scope='module')
def lineitem(ray_session):
    import ray.data
    return ray.data.read_parquet(
        SF_DIR + '/lineitem.parquet',
        columns=['l_orderkey', 'l_quantity', 'l_discount',
                 'l_returnflag', 'l_linestatus'])


def test_annotate_mode(lineitem):
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    out = validate_dataset(lineitem, LINEITEM_SPEC, mode='annotate')
    t = pa.concat_tables(
        out.iter_batches(batch_size=10000, batch_format='pyarrow'))
    assert t.num_rows == lineitem.count()
    assert 'valid' in t.schema.names
    # Driver testdata is clean TPC-H-ish data: everything in range.
    valid = t.column('valid').to_pylist()
    assert all(valid)


def test_violations_mode(ray_session):
    import ray.data
    ds = ray.data.read_parquet(SF_DIR + '/orders.parquet',
                               columns=['o_orderkey', 'o_orderstatus',
                                        'o_totalprice'])
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    spec = {
        'properties': {
            # Plant a failing rule so violations are non-empty: totalprice
            # capped absurdly low.
            'o_totalprice': {'type': 'number', 'maximum': 1000},
            'o_orderstatus': {'enum': ['O', 'F', 'P']},
        },
    }
    out = validate_dataset(ds, spec, mode='violations',
                           key_column='o_orderkey')
    rows = out.take_all()
    assert rows, 'expected planted violations'
    sample = rows[0]
    assert sample['rule'] == 'maximum'
    assert 'must be smaller than or equal to 1000' in sample['message']
    assert sample['name'] == 'data.o_totalprice'
    assert sample['key'] is not None


def test_stage_smoke_direct():
    """Actor __init__ failures surface late in Ray; smoke the callable class
    directly (ray guide pitfall)."""
    from python_fastjsonschema_ray.pipelines.validate import ValidatorStage
    schema = pa.schema([('a', pa.int64())])
    stage = ValidatorStage({'properties': {'a': {'minimum': 0}}}, schema,
                           mode='violations')
    out = stage(pa.table({'a': pa.array([1, -2], type=pa.int64())}))
    assert out.num_rows == 1
    assert out.column('message').to_pylist() == [
        'data.a must be bigger than or equal to 0']
