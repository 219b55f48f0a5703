"""Exact distributed quantile (histogram narrowing) vs numpy/DuckDB."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _ds(vals, blocks=4):
    import ray.data
    return ray.data.from_arrow(pa.table({
        'x': pa.array(vals, type=pa.float64())})).repartition(blocks)


def _disc_rank(n, q):
    return max(int(math.ceil(n * q)) - 1, 0)


def test_select_rank_randomized(ray_session):
    from python_fastjsonschema_ray.stages.quantile import select_rank
    rng = np.random.default_rng(7)
    vals = rng.normal(100, 25, size=5000).round(3)
    ds = _ds(vals.tolist())
    srt = np.sort(vals)
    # Tiny collect_limit forces several narrowing iterations.
    for rank in (0, 1, 2499, 4998, 4999):
        got = select_rank(ds, 'x', rank, bins=16, collect_limit=50)
        assert got == srt[rank], (rank, got, srt[rank])


def test_exact_quantile_disc_semantics(ray_session):
    from python_fastjsonschema_ray.stages.quantile import exact_quantile
    vals = [5.0, 1.0, 3.0, 2.0, 4.0]
    ds = _ds(vals, blocks=2)
    srt = sorted(vals)
    for q in (0.0, 0.25, 0.5, 0.9, 1.0):
        assert exact_quantile(ds, 'x', q) == srt[_disc_rank(len(vals), q)]


def test_exact_quantile_duplicate_mass(ray_session):
    """A single dominant value cannot stall the narrowing (range
    collapses to the point)."""
    from python_fastjsonschema_ray.stages.quantile import exact_quantile
    vals = [7.0] * 3000 + [1.0, 99.0]
    got = exact_quantile(_ds(vals), 'x', 0.5, bins=8, collect_limit=10)
    assert got == 7.0


def test_exact_quantile_nulls_and_empty(ray_session):
    from python_fastjsonschema_ray.stages.quantile import exact_quantile
    import ray.data
    ds = ray.data.from_arrow(pa.table({
        'x': pa.array([None, 2.0, None, 1.0, 3.0], type=pa.float64())}))
    assert exact_quantile(ds, 'x', 0.5) == 2.0     # nulls excluded
    empty = ray.data.from_arrow(pa.table({
        'x': pa.array([], type=pa.float64())}))
    assert exact_quantile(empty, 'x', 0.5) is None


def test_select_rank_out_of_range(ray_session):
    from python_fastjsonschema_ray.stages.quantile import select_rank
    with pytest.raises(ValueError, match='out of range'):
        select_rank(_ds([1.0, 2.0]), 'x', 5)


def test_exact_quantile_vs_duckdb_testdata(ray_session):
    import duckdb
    import ray.data
    from python_fastjsonschema_ray.stages.quantile import exact_quantile
    path = '/root/testdata/sf0.001/lineitem.parquet'
    ds = ray.data.read_parquet(path, columns=['l_extendedprice'])
    con = duckdb.connect()
    for q in (0.5, 0.99):
        exp = con.execute(
            "SELECT quantile_disc(l_extendedprice, {}) FROM "
            "read_parquet('{}')".format(q, path)).fetchone()[0]
        assert exact_quantile(ds, 'l_extendedprice', q,
                              collect_limit=100) == pytest.approx(
            float(exp), abs=0)


def test_grouped_quantile_vs_duckdb(ray_session):
    import duckdb
    import ray.data
    from python_fastjsonschema_ray.stages.quantile import grouped_quantile
    sf = '/root/testdata/sf0.001'
    ds = ray.data.read_parquet(sf + '/lineitem.parquet',
                               columns=['l_returnflag', 'l_extendedprice'])
    out = grouped_quantile(ds, ['l_returnflag'], 'l_extendedprice',
                           [0.5, 0.95]).to_pandas()
    con = duckdb.connect()
    exp = con.execute("""
        SELECT l_returnflag, 0.5 AS q,
               quantile_disc(l_extendedprice, 0.5) AS value
        FROM read_parquet('{sf}/lineitem.parquet') GROUP BY l_returnflag
        UNION ALL
        SELECT l_returnflag, 0.95, quantile_disc(l_extendedprice, 0.95)
        FROM read_parquet('{sf}/lineitem.parquet') GROUP BY l_returnflag
    """.format(sf=sf)).df()
    got = sorted(map(tuple, out[['l_returnflag', 'q', 'value']]
                     .itertuples(index=False)))
    want = sorted((r.l_returnflag, float(r.q), r.value)
                  for r in exp.itertuples(index=False))
    assert got == want


def test_grouped_quantile_null_and_singleton_groups(ray_session):
    import pandas as pd
    import ray.data
    from python_fastjsonschema_ray.stages.quantile import grouped_quantile
    ds = ray.data.from_arrow(pa.table({
        'k': pa.array(['a', 'a', 'a', 'b', 'c', 'c', None]),
        'v': pa.array([3.0, 1.0, 2.0, 9.0, None, None, 7.0],
                      type=pa.float64())})).repartition(3)
    out = grouped_quantile(ds, ['k'], 'v', [0.5]).to_pandas()
    by_k = {(r.k if isinstance(r.k, str) else None): r.value
            for r in out.itertuples(index=False)}
    assert by_k['a'] == 2.0        # rank ceil(3*.5)-1 = 1 of [1,2,3]
    assert by_k['b'] == 9.0        # singleton
    assert pd.isna(by_k['c'])      # all-null group -> null quantile
    assert by_k[None] == 7.0       # null key is its own SQL group
    assert len(out) == 4


def test_select_ranks_shared_passes_match_singletons(ray_session):
    """Multi-rank narrowing returns exactly what per-rank calls return,
    including extreme ranks and duplicate-heavy data."""
    import numpy as np
    import pandas as pd
    import ray.data
    from python_fastjsonschema_ray.stages.quantile import (
        exact_quantiles, select_rank, select_ranks)

    rng = np.random.default_rng(21)
    vals = np.concatenate([rng.normal(0, 1, 2000).round(3),
                           np.full(500, 7.25)])       # duplicate mass
    ds = ray.data.from_pandas(pd.DataFrame({'v': vals})).repartition(6)

    ranks = [0, 1, 100, 1250, len(vals) - 1]
    multi = select_ranks(ds, 'v', ranks, collect_limit=200)
    srt = np.sort(vals)
    assert multi == [float(srt[r]) for r in ranks]
    for r, got in zip(ranks, multi):
        assert select_rank(ds, 'v', r, collect_limit=200) == got

    qs = [0.05, 0.5, 0.95]
    got = exact_quantiles(ds, 'v', qs, collect_limit=200)
    want = [float(srt[max(int(np.ceil(len(vals) * q)) - 1, 0)])
            for q in qs]
    assert got == want


def test_select_ranks_duplicate_mass_stall_bounded(ray_session):
    """A range stalled at ULP scale with heavy duplicate mass on BOTH
    boundary floats resolves arithmetically from (unique, count)
    pairs — the driver never collects O(rows) values (collect_limit
    far below `remaining` here)."""
    import ray.data
    from python_fastjsonschema_ray.stages.quantile import select_ranks
    lo = 1.0
    hi = np.nextafter(np.nextafter(1.0, 2.0), 2.0)  # lo + 2 ulp
    mid = np.nextafter(1.0, 2.0)
    vals = np.concatenate([
        np.full(40_000, lo), np.full(30_000, mid), np.full(30_000, hi)])
    rng = np.random.default_rng(7)
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({'v': pa.array(vals)})) \
        .repartition(8)
    got = select_ranks(ds, 'v', [0, 39_999, 40_000, 69_999, 70_000,
                                 99_999], collect_limit=100, bins=16)
    assert got == [lo, lo, mid, mid, hi, hi]


def test_manifest_violation_name_resets_per_attempt():
    """A retried task attempt on a worker that already ran an earlier
    attempt must restart batch ordinals at 0 so the retry OVERWRITES
    attempt 1's files instead of double-counting."""
    from unittest import mock

    from python_fastjsonschema_ray.pipelines import manifest as m

    class Ctx:
        def get_task_id(self):
            return 'deadbeef'

    with mock.patch('ray.get_runtime_context', return_value=Ctx()):
        core = mock.Mock()
        with mock.patch('ray._private.worker.global_worker') as gw:
            gw.core_worker = core
            m._TASK_BATCH_ORDINALS.clear()
            core.get_current_task_attempt_number.return_value = 0
            first = [m._violation_file_name() for _ in range(3)]
            core.get_current_task_attempt_number.return_value = 1
            retry = [m._violation_file_name() for _ in range(3)]
    assert first == retry == ['task-deadbeef-{:05d}.parquet'.format(i)
                              for i in range(3)]
    m._TASK_BATCH_ORDINALS.clear()


def test_exact_quantile_skips_nan(ray_session):
    """NaN values are skipped like nulls (SQL convention): quantiles
    over a NaN-interleaved column equal numpy's quantile_disc over the
    finite values only."""
    import numpy as np
    import pandas as pd
    import ray.data
    from python_fastjsonschema_ray.stages.quantile import exact_quantile

    rng = np.random.default_rng(12)
    v = rng.normal(50, 10, 1000)
    v[::4] = np.nan
    ds = ray.data.from_pandas(pd.DataFrame({'v': v})).repartition(4)
    finite = np.sort(v[~np.isnan(v)])
    for q in (0.1, 0.5, 0.9):
        want = finite[max(int(np.ceil(len(finite) * q)) - 1, 0)]
        assert exact_quantile(ds, 'v', q) == want
