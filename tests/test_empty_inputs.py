"""Degenerate-input robustness sweeps: every driver query over (a)
zero-row tables, (b) tables whose payload columns are ALL NULL, and
(c) tables whose float columns carry interleaved NaN values.

At 100 TB scale all three are routine — shards whose filters drop
every row, shards where the text / embedding / payload column is null,
and numeric columns with NaN —
so every operator must tolerate them: return an empty (or
degenerate-aggregate) result, never crash with a KeyError /
AttributeError deep in a stage, and NEVER silently misalign (a
partially-null embedding column through ``flatten().reshape`` would
pair row i's id with row j's vector — the helpers now refuse nulls
and the operators filter them first).

Two estimator fits are the documented exceptions: fitting k-means or
PCA on zero (non-null) rows is a genuine user error, and they raise a
CLEAN, message-bearing ValueError instead of an internal crash.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = '/root/testdata/sf0.001'
TABLES = ('region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings')

# Key / timestamp columns stay populated in the all-null-payload
# fixture (a corpus with null ids is not a recoverable input; null
# payloads are).
KEY_COLUMNS = {
    'doc_id', 'vec_id', 'event_id', 'user_id', 'ts', 'c_custkey',
    'o_orderkey', 'o_custkey', 'o_orderdate', 'l_orderkey', 'l_partkey',
    'l_suppkey', 'l_linenumber', 'l_shipdate', 'n_nationkey',
    'n_regionkey', 'r_regionkey', 'p_partkey', 's_suppkey', 's_nationkey',
}

# Queries whose semantics REQUIRE rows (estimator fits): they must
# raise a clean ValueError whose message names the constraint.
CLEAN_VALUEERROR = {
    'kmeans_embeddings': 'at least one row',
    'pca_embeddings': 'at least 2 rows',
}


@pytest.fixture(scope='module')
def empty_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp('sf_empty')
    for t in TABLES:
        schema = pq.read_schema(
            os.path.join(SRC, t + '.parquet')).remove_metadata()
        pq.write_table(schema.empty_table(),
                       str(root / (t + '.parquet')))
    return str(root)


@pytest.fixture(scope='module')
def null_payload_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp('sf_null')
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC, t + '.parquet')).slice(0, 50)
        cols = [tab.column(f.name) if f.name in KEY_COLUMNS
                else pa.nulls(tab.num_rows, type=f.type)
                for f in tab.schema]
        out = pa.table(dict(zip(tab.schema.names, cols))) \
            .replace_schema_metadata(None)
        pq.write_table(out, str(root / (t + '.parquet')))
    return str(root)


def _sweep(mod, sf_dir, expect_estimator_errors=True):
    clean_errors = CLEAN_VALUEERROR if expect_estimator_errors else {}
    failures = []
    for name, fn in sorted(mod.queries().items()):
        try:
            result = fn(sf_dir)
            # Materializing proves the lazy plan executes end-to-end.
            # Row counts are NOT policed: aggregates legitimately emit
            # degenerate all-null rows, schema inference emits one row
            # per column, and the multimodal queries synthesize their
            # own media inputs independent of the sf tables.
            df = result.to_pandas() if hasattr(result, 'to_pandas') \
                else result
            assert df is not None, name
            if name in clean_errors:
                failures.append((name, 'expected ValueError, got result'))
        except ValueError as exc:
            if name not in clean_errors:
                failures.append((name, 'ValueError', str(exc)[:200]))
            elif clean_errors[name] not in str(exc):
                failures.append((name, 'wrong message', str(exc)[:200]))
        except Exception as exc:  # noqa: BLE001 — report every crash
            failures.append((name, type(exc).__name__, str(exc)[:200]))
    assert not failures, '\n'.join(repr(f) for f in failures)


@pytest.fixture(scope='module')
def nan_sf(tmp_path_factory):
    """Every 5th value of every float column is NaN (keys untouched) —
    NaN is a VALUE to Arrow, not a null, and must be skipped like one
    by the aggregate/quantile folds and reported as a clean violation
    by numeric keywords (the reference crashes on nan multipleOf —
    pinned in test_reference_divergences.py)."""
    import numpy as np
    root = tmp_path_factory.mktemp('sf_nan')
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC, t + '.parquet'))
        cols = {}
        for f in tab.schema:
            col = tab.column(f.name)
            if pa.types.is_floating(f.type):
                v = np.array(col.to_pandas(), dtype=np.float64, copy=True)
                v[::5] = np.nan
                col = pa.chunked_array([pa.array(v, type=f.type,
                                                 from_pandas=False)])
            cols[f.name] = col
        pq.write_table(pa.table(cols).replace_schema_metadata(None),
                       str(root / (t + '.parquet')))
    return str(root)


def test_every_query_tolerates_empty_tables(ray_session, empty_sf):
    import __ray_entry__ as mod
    _sweep(mod, empty_sf)


def test_every_query_tolerates_null_payloads(ray_session, null_payload_sf):
    import __ray_entry__ as mod
    _sweep(mod, null_payload_sf)


def test_every_query_tolerates_nan_floats(ray_session, nan_sf):
    import __ray_entry__ as mod
    _sweep(mod, nan_sf, expect_estimator_errors=False)
