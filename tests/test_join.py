"""Equi-join stages: broadcast lookup join + bucketed shuffle join vs
DuckDB on testdata, plus the semantic edge cases (nulls, duplicates,
left join, collision guard)."""

import duckdb
import pyarrow as pa
import pytest

SF = '/root/testdata/sf0.001'


@pytest.fixture(scope='module')
def ddb():
    con = duckdb.connect()
    for t in ('orders', 'customer', 'lineitem'):
        con.execute(
            "CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            .format(t=t, sf=SF))
    return con


def _norm(df, cols):
    return sorted(map(tuple, df[cols].itertuples(index=False)))


def test_broadcast_lookup_join_vs_duckdb(ray_session, ddb):
    import ray.data
    from python_fastjsonschema_ray.stages.join import broadcast_lookup_join
    orders = ray.data.read_parquet(SF + '/orders.parquet',
                                   columns=['o_orderkey', 'o_custkey'])
    cust = ray.data.read_parquet(SF + '/customer.parquet',
                                 columns=['c_custkey', 'c_mktsegment'])
    out = broadcast_lookup_join(orders, 'o_custkey', cust, 'c_custkey',
                                ['c_mktsegment'], check_unique=True)
    got = out.to_pandas()
    exp = ddb.execute("""
        SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """).df()
    cols = ['o_orderkey', 'o_custkey', 'c_mktsegment']
    assert _norm(got, cols) == _norm(exp, cols)
    assert str(got['o_orderkey'].dtype) == 'int64'


def test_broadcast_lookup_join_left_and_nulls(ray_session):
    import ray.data
    from python_fastjsonschema_ray.stages.join import broadcast_lookup_join
    left = ray.data.from_arrow(pa.table({
        'id': pa.array([1, 2, 3, 4], type=pa.int64()),
        'fk': pa.array([10, 99, None, 20], type=pa.int64())}))
    ref = ray.data.from_arrow(pa.table({
        'k': pa.array([10, 20], type=pa.int64()),
        'v': pa.array(['a', 'b'])}))
    inner = broadcast_lookup_join(left, 'fk', ref, 'k', ['v']).to_pandas()
    assert _norm(inner, ['id', 'v']) == [(1, 'a'), (4, 'b')]
    lj = broadcast_lookup_join(left, 'fk', ref, 'k', ['v'],
                               how='left').to_pandas()
    by_id = dict(zip(lj['id'], lj['v']))
    assert by_id[1] == 'a' and by_id[4] == 'b'
    assert by_id[2] is None and by_id[3] is None
    assert len(lj) == 4


def test_broadcast_lookup_join_duplicate_ref_raises(ray_session):
    import ray.data
    from python_fastjsonschema_ray.stages.join import broadcast_lookup_join
    left = ray.data.from_arrow(pa.table({'fk': pa.array([1], pa.int64())}))
    ref = ray.data.from_arrow(pa.table({
        'k': pa.array([1, 1], type=pa.int64()),
        'v': pa.array(['a', 'b'])}))
    with pytest.raises(ValueError, match='not unique'):
        broadcast_lookup_join(left, 'fk', ref, 'k', ['v'],
                              check_unique=True)


def test_shuffle_join_vs_duckdb(ray_session, ddb):
    import ray.data
    from python_fastjsonschema_ray.stages.join import shuffle_join
    li = ray.data.read_parquet(SF + '/lineitem.parquet',
                               columns=['l_orderkey', 'l_quantity'])
    orders = ray.data.read_parquet(SF + '/orders.parquet',
                                   columns=['o_orderkey', 'o_orderstatus'])
    out = shuffle_join(li, orders, 'l_orderkey', 'o_orderkey',
                       ['o_orderstatus']).to_pandas()
    exp = ddb.execute("""
        SELECT l.l_orderkey, l.l_quantity, o.o_orderstatus
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """).df()
    cols = ['l_orderkey', 'l_quantity', 'o_orderstatus']
    assert _norm(out, cols) == _norm(exp, cols)
    assert str(out['l_orderkey'].dtype) == 'int64'


def test_shuffle_join_duplicates_and_nulls(ray_session):
    """Duplicate keys on BOTH sides produce the SQL cross product; null
    keys never match."""
    import ray.data
    from python_fastjsonschema_ray.stages.join import shuffle_join
    left = ray.data.from_arrow(pa.table({
        'k': pa.array([1, 1, 2, None], type=pa.int64()),
        'lv': pa.array(['x', 'y', 'z', 'n'])})).repartition(2)
    right = ray.data.from_arrow(pa.table({
        'rk': pa.array([1, 1, None], type=pa.int64()),
        'rv': pa.array(['p', 'q', 'nn'])})).repartition(2)
    out = shuffle_join(left, right, 'k', 'rk', ['rv']).to_pandas()
    got = sorted(map(tuple, out[['k', 'lv', 'rv']].itertuples(index=False)))
    assert got == [(1, 'x', 'p'), (1, 'x', 'q'), (1, 'y', 'p'),
                   (1, 'y', 'q')]


def test_shuffle_join_collision_guard(ray_session):
    import ray.data
    from python_fastjsonschema_ray.stages.join import shuffle_join
    a = ray.data.from_arrow(pa.table({'k': pa.array([1], pa.int64()),
                                      'v': pa.array(['x'])}))
    b = ray.data.from_arrow(pa.table({'k': pa.array([1], pa.int64()),
                                      'v': pa.array(['y'])}))
    with pytest.raises(ValueError, match='collide'):
        shuffle_join(a, b, 'k', 'k', ['v'])
