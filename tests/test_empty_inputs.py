"""Empty-input robustness sweep: every driver query over zero-row
tables.

At 100 TB scale, shards whose filters drop every row — or entirely
empty partitions — are routine, so every operator must tolerate a
fully-empty input: return an empty (or degenerate-aggregate) result,
never crash with a KeyError / AttributeError deep in a stage.  The
sweep builds schema-identical zero-row versions of all ten contract
tables and runs the complete ``queries()`` surface against them.

Two estimator fits are the documented exceptions: fitting k-means or
PCA on zero rows is a genuine user error, and they raise a CLEAN,
message-bearing ValueError instead of an internal crash.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = '/root/testdata/sf0.001'
TABLES = ('region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings')

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


def test_every_query_tolerates_empty_tables(ray_session, empty_sf):
    import __ray_entry__ as mod

    failures = []
    for name, fn in sorted(mod.queries().items()):
        try:
            result = fn(empty_sf)
            # Materializing proves the lazy plan executes end-to-end.
            # Row counts are NOT policed: aggregates legitimately emit
            # degenerate all-null rows, schema inference emits one row
            # per column, and the multimodal queries synthesize their
            # own media inputs independent of the sf tables.
            df = result.to_pandas() if hasattr(result, 'to_pandas') \
                else result
            assert df is not None, name
            if name in CLEAN_VALUEERROR:
                failures.append((name, 'expected ValueError, got result'))
        except ValueError as exc:
            if name not in CLEAN_VALUEERROR:
                failures.append((name, 'ValueError', str(exc)[:200]))
            elif CLEAN_VALUEERROR[name] not in str(exc):
                failures.append((name, 'wrong message', str(exc)[:200]))
        except Exception as exc:  # noqa: BLE001 — report every crash
            failures.append((name, type(exc).__name__, str(exc)[:200]))
    assert not failures, '\n'.join(repr(f) for f in failures)
