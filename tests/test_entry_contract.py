"""Emulates the driver's correctness gate: run every queries() entry
and compare against oracle_sql() via DuckDB — row count, column names,
and order-insensitive values — at BOTH sf0.01 (the driver's scale) and
sf0.001 (catches sf-hardcoding; exercises empty-result schema
preservation)."""

import math

import duckdb
import pandas as pd
import pytest

SF = '/root/testdata/sf0.01'
TABLES = ('region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings')


@pytest.fixture(scope='module')
def contract(ray_session):
    import __ray_entry__ as mod
    return mod


def _ddb(sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            .format(t=t, sf=sf))
    return con


@pytest.fixture(scope='module')
def ddb():
    return _ddb(SF)


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, 'to_pandas'):
        return result.to_pandas()
    raise TypeError(type(result))


def normalize(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append('nan')
                else:
                    norm.append(round(v, 6))
            else:
                norm.append(v)
        rows.append(tuple(norm))
    return sorted(map(repr, rows))


@pytest.mark.parametrize('sf_dir', [SF, '/root/testdata/sf0.001'],
                         ids=['sf0.01', 'sf0.001'])
def test_all_sql_queries_match_oracle(contract, sf_dir):
    ddb = _ddb(sf_dir)
    queries = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(queries)
    failures = []
    for name, sql in oracles.items():
        try:
            mine = to_pandas(queries[name](sf_dir))
            theirs = ddb.execute(sql).df()
            if sorted(mine.columns) != sorted(theirs.columns):
                failures.append((name, 'columns', list(mine.columns),
                                 list(theirs.columns)))
                continue
            a, b = normalize(mine), normalize(theirs)
            if a != b:
                diff_a = [x for x in a if x not in set(b)][:3]
                diff_b = [x for x in b if x not in set(a)][:3]
                failures.append((name, 'values', len(a), len(b),
                                 diff_a, diff_b))
        except Exception as exc:  # keep going, report all
            failures.append((name, 'error', repr(exc)[:500]))
    assert not failures, '\n'.join(repr(f) for f in failures)


def test_rows_only_queries_run(contract):
    queries = contract.queries()
    oracles = contract.oracle_sql()
    for name in set(queries) - set(oracles):
        out = to_pandas(queries[name](SF))
        assert out is not None, name


def test_entry_smoke(contract):
    result = contract.entry()
    df = to_pandas(result.limit(100)) if hasattr(result, 'limit') \
        else to_pandas(result)
    assert len(df) >= 0
    assert 'valid' in df.columns
