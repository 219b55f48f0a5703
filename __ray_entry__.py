"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship validation pipeline over sf0.001;
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (and the training-data extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init``/``ray.shutdown``.

Float-valued outputs are ROUNDED identically on both sides (the driver
compares order-insensitive value hashes, so float association order must
not leak into results).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa


def _read(sf_dir: str, table: str, columns=None):
    import ray.data
    return ray.data.read_parquet(
        '{}/{}.parquet'.format(sf_dir, table), columns=columns)


def _df_with_columns(ds, columns) -> pd.DataFrame:
    """Materialize a (small) result Dataset, keeping the declared column
    names even when the result is empty (an empty Ray→pandas conversion
    drops the schema, which would fail the driver's schema compare)."""
    df = ds.to_pandas()
    if df.empty:
        return pd.DataFrame({c: pd.Series(dtype='object') for c in columns})
    return df[list(columns)]


# A fixed, deterministic 64-dim query vector for similarity search
# (alternating +1/-0.5 pattern; also embedded in the oracle SQL literal).
_ANN_QUERY = [1.0 if i % 2 == 0 else -0.5 for i in range(64)]


# ---------------------------------------------------------------------------
# Query implementations


def q_stats_lineitem(sf_dir: str):
    """Column stats via streaming partial aggregation (SURVEY §2.5 aggregations)."""
    from python_fastjsonschema_ray.pipelines.constraints import column_stats
    ds = _read(sf_dir, 'lineitem', ['l_quantity', 'l_extendedprice'])
    s = column_stats(ds, ['l_quantity', 'l_extendedprice'],
                     quantiles=())
    return pd.DataFrame([{
        'n_rows': s['l_quantity']['count'],
        'n_null_qty': s['l_quantity']['nulls'],
        'min_qty': round(float(s['l_quantity']['min']), 3),
        'max_qty': round(float(s['l_quantity']['max']), 3),
        'sum_qty': round(s['l_quantity']['sum'], 2),
        'avg_price': round(s['l_extendedprice']['mean'], 4),
    }])


def q_range_violations_lineitem(sf_dir: str):
    """Vectorized range validation (minimum/maximum keywords) → violation
    rows (key, rule); all failing rules per row (collect mode)."""
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    ds = _read(sf_dir, 'lineitem',
               ['l_orderkey', 'l_quantity', 'l_discount', 'l_extendedprice'])
    spec = {
        'type': 'object',
        'properties': {
            'l_quantity': {'type': 'number', 'maximum': 45},
            'l_discount': {'type': 'number', 'maximum': 0.08},
            'l_extendedprice': {'type': 'number', 'minimum': 1000},
        },
    }
    out = validate_dataset(ds, spec, mode='violations',
                           key_column='l_orderkey', fast_fail=False)
    return out.select_columns(['key', 'rule'])


def q_enum_orders(sf_dir: str):
    """Enum keyword over o_orderstatus; violating rows grouped by value."""
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    from ray.data.aggregate import Count
    ds = _read(sf_dir, 'orders', ['o_orderkey', 'o_orderstatus'])
    spec = {'properties': {'o_orderstatus': {'enum': ['O', 'F']}}}
    annotated = validate_dataset(ds, spec, mode='annotate')
    bad = annotated.filter(expr='valid == False')
    return bad.groupby('o_orderstatus').aggregate(Count(alias_name='n'))


def q_minlength_documents(sf_dir: str):
    """minLength keyword over documents.text."""
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    spec = {'properties': {'text': {'type': 'string', 'minLength': 100}}}
    out = validate_dataset(ds, spec, mode='violations', key_column='doc_id')
    return out.select_columns(['key'])


def q_pattern_customer(sf_dir: str):
    """pattern keyword (RE2 vector kernel) over customer names."""
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    ds = _read(sf_dir, 'customer', ['c_custkey', 'c_name'])
    spec = {'properties': {
        'c_name': {'type': 'string', 'pattern': '^Customer#0000000[0-9]{2}$'}}}
    out = validate_dataset(ds, spec, mode='violations', key_column='c_custkey')
    return out.select_columns(['key'])


def q_format_events_props(sf_dir: str):
    """contentMediaType(application/json) column transform: rows whose props
    fail to parse as JSON (none in clean data — the zero must match)."""
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    ds = _read(sf_dir, 'events', ['event_id', 'props'])
    spec = {'properties': {
        'props': {'type': 'string',
                  'contentMediaType': 'application/json'}}}
    out = validate_dataset(ds, spec, mode='violations', key_column='event_id')
    return _df_with_columns(out, ['key'])


def q_referential_orders(sf_dir: str):
    """Broadcast anti-join: orders.o_custkey ∉ customer.c_custkey."""
    from python_fastjsonschema_ray.pipelines.constraints import check_referential
    orders = _read(sf_dir, 'orders', ['o_orderkey', 'o_custkey'])
    customer = _read(sf_dir, 'customer', ['c_custkey'])
    out = check_referential(orders, 'o_custkey', customer, 'c_custkey')
    return _df_with_columns(out, ['o_orderkey', 'o_custkey'])


def q_unique_events(sf_dir: str):
    """Duplicate-key detection with per-batch pre-aggregation."""
    from python_fastjsonschema_ray.pipelines.constraints import check_unique
    ds = _read(sf_dir, 'events', ['event_id'])
    return _df_with_columns(check_unique(ds, ['event_id']), ['event_id', 'n'])


def q_dedup_exact_documents(sf_dir: str):
    """Exact dedup winners (min doc_id per distinct text) — pure
    groupby-aggregate, no per-group pandas overhead."""
    from python_fastjsonschema_ray.pipelines.constraints import dedup_winner_ids
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return dedup_winner_ids(ds, ['text'], 'doc_id')


def q_token_count_documents(sf_dir: str):
    """Whitespace token counting (vectorized text stage)."""
    from python_fastjsonschema_ray.stages.text import TokenCountStage
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    out = ds.map_batches(TokenCountStage('text'), batch_format='pandas')
    return out.select_columns(['doc_id', 'n_tokens'])


def q_quality_documents(sf_dir: str):
    """Alphabetic-ratio quality metric (SQL-checkable slice of the quality
    stage)."""
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])

    def alpha(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch['text'].str.len()
        a = batch['text'].str.count(r'[A-Za-z]')
        return pd.DataFrame({
            'doc_id': batch['doc_id'],
            'alpha_ratio': (a / n.clip(lower=1)).round(4),
        })

    return ds.map_batches(alpha, batch_format='pandas')


def q_topk_documents(sf_dir: str):
    """Top-k by length: distributed sort + limit."""
    ds = _read(sf_dir, 'documents', ['doc_id', 'n_chars'])
    return ds.sort(['n_chars', 'doc_id'], descending=[True, False]).limit(10)


def q_group_stats_lineitem(sf_dir: str):
    """Grouped aggregation (shuffle) with named outputs."""
    from ray.data.aggregate import Count, Sum
    ds = _read(sf_dir, 'lineitem', ['l_returnflag', 'l_quantity'])
    out = ds.groupby('l_returnflag').aggregate(
        Sum('l_quantity', alias_name='sum_qty'),
        Count(alias_name='n'))

    def round_qty(batch: pd.DataFrame) -> pd.DataFrame:
        batch['sum_qty'] = batch['sum_qty'].round(2)
        return batch

    return out.map_batches(round_qty, batch_format='pandas')


def q_embedding_dims(sf_dir: str):
    """minItems/maxItems over a list<float> column."""
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    spec = {'properties': {
        'embedding': {'type': 'array', 'minItems': 64, 'maxItems': 64}}}
    out = validate_dataset(ds, spec, mode='violations', key_column='vec_id')
    return _df_with_columns(out, ['key'])


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 against the fixed query vector."""
    from python_fastjsonschema_ray.stages.ann import topk_cosine
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    df = topk_cosine(ds, 'vec_id', 'embedding', np.asarray(_ANN_QUERY), k=10)
    return pd.DataFrame({
        'vec_id': df['vec_id'].astype('int64'),
        'sim': df['sim'].round(4),
    })


def q_windowed_events(sf_dir: str):
    """Tumbling-window aggregate (per-batch partial agg → small groupby)."""
    from python_fastjsonschema_ray.stages.windows import tumbling_window_agg
    ds = _read(sf_dir, 'events', ['ts', 'event_type', 'value'])
    out = tumbling_window_agg(ds, 'ts', 'event_type', 'value', 3600)

    def round_sum(batch: pd.DataFrame) -> pd.DataFrame:
        batch['sum_value'] = batch['sum_value'].round(2)
        return batch

    return out.map_batches(round_sum, batch_format='pandas')


def q_sessions_events(sf_dir: str):
    """Session windows (30-min gap) per user (groupby + sorted map_groups)."""
    from python_fastjsonschema_ray.stages.windows import session_windows
    ds = _read(sf_dir, 'events', ['ts', 'user_id'])
    return session_windows(ds, 'ts', 'user_id', 1800)


def q_events_value_high(sf_dir: str):
    """maximum keyword over events.value with a threshold inside the domain."""
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    ds = _read(sf_dir, 'events', ['event_id', 'value'])
    spec = {'properties': {'value': {'type': 'number', 'maximum': 400}}}
    out = validate_dataset(ds, spec, mode='violations', key_column='event_id')
    return out.select_columns(['key', 'rule'])


# -- non-SQL-expressible operators (rows-only driver check) -----------------


def q_langid_documents(sf_dir: str):
    from python_fastjsonschema_ray.stages.text import LangIdStage
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    out = ds.map_batches(LangIdStage('text'), batch_format='pandas')
    return out.select_columns(['doc_id', 'lang_pred'])


def q_fingerprint_documents(sf_dir: str):
    from python_fastjsonschema_ray.stages.text import FingerprintStage
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    out = ds.map_batches(FingerprintStage('text'), batch_format='pandas')
    return out.select_columns(['doc_id', 'fingerprint'])


def q_simhash_documents(sf_dir: str):
    from python_fastjsonschema_ray.stages.dedup import SimHashStage
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    out = ds.map_batches(SimHashStage('doc_id', 'text'),
                         batch_format='pandas')
    return out.select_columns(['doc_id', 'simhash'])


def q_minhash_pairs_documents(sf_dir: str):
    from python_fastjsonschema_ray.stages.dedup import minhash_duplicate_pairs
    ds = _read(sf_dir, 'documents', ['doc_id', 'text'])
    return minhash_duplicate_pairs(ds, 'doc_id', 'text', threshold=0.8)


def q_embedding_near_dup(sf_dir: str):
    from python_fastjsonschema_ray.stages.dedup import embedding_duplicate_pairs
    ds = _read(sf_dir, 'embeddings', ['vec_id', 'embedding'])
    return embedding_duplicate_pairs(ds, 'vec_id', 'embedding', dim=64,
                                     threshold=0.999)


def q_drift_lineitem(sf_dir: str):
    from python_fastjsonschema_ray.pipelines.constraints import (
        drift_check, histogram_profile)
    ds = _read(sf_dir, 'lineitem', ['l_quantity'])
    edges = np.linspace(0, 55, 23)
    profile = histogram_profile(ds, 'l_quantity', edges)
    report = drift_check(ds, 'l_quantity', profile, edges)
    return pd.DataFrame([{k: report[k] for k in
                          ('column', 'psi', 'ks', 'drifted')}])


def q_image_flagship(sf_dir: str):
    """North-rule flagship over a synthesized image+caption shard."""
    from python_fastjsonschema_ray.pipelines.flagship import run_flagship
    from python_fastjsonschema_ray.sources.images import image_dataset
    ds = image_dataset(1000, seed=42, violation_rate=0.01, shard_size=250)
    report, _ = run_flagship(ds, stats=False)
    rows = []
    for rule, n in sorted(report['schema_violations'].items()):
        rows.append({'check': 'schema:' + rule, 'n': int(n)})
    for rule, n in sorted(report['content_violations'].items()):
        rows.append({'check': 'content:' + rule, 'n': int(n)})
    rows.append({'check': 'duplicates', 'n': int(report['duplicate_keys'])})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Contract surface


def entry() -> Any:
    """Flagship pipeline on sf0.001: validate lineitem + orders with the
    vectorized table validator and return the annotated verdicts summary."""
    sf_dir = '/root/testdata/sf0.001'
    from python_fastjsonschema_ray.pipelines.validate import validate_dataset
    ds = _read(sf_dir, 'lineitem',
               ['l_orderkey', 'l_quantity', 'l_discount', 'l_returnflag'])
    spec = {
        'type': 'object',
        'properties': {
            'l_orderkey': {'type': 'integer', 'minimum': 0},
            'l_quantity': {'type': 'number', 'minimum': 1, 'maximum': 50},
            'l_discount': {'type': 'number', 'minimum': 0, 'maximum': 0.1},
            'l_returnflag': {'enum': ['A', 'N', 'R']},
        },
        'required': ['l_orderkey', 'l_quantity'],
    }
    annotated = validate_dataset(ds, spec, mode='annotate')
    return annotated


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        'stats_lineitem': q_stats_lineitem,
        'range_violations_lineitem': q_range_violations_lineitem,
        'enum_orders': q_enum_orders,
        'minlength_documents': q_minlength_documents,
        'pattern_customer': q_pattern_customer,
        'json_props_events': q_format_events_props,
        'referential_orders': q_referential_orders,
        'unique_events': q_unique_events,
        'dedup_exact_documents': q_dedup_exact_documents,
        'token_count_documents': q_token_count_documents,
        'quality_documents': q_quality_documents,
        'topk_documents': q_topk_documents,
        'group_stats_lineitem': q_group_stats_lineitem,
        'embedding_dims': q_embedding_dims,
        'ann_topk': q_ann_topk,
        'events_value_high': q_events_value_high,
        'windowed_events': q_windowed_events,
        'sessions_events': q_sessions_events,
        # rows-only (no SQL equivalent):
        'langid_documents': q_langid_documents,
        'fingerprint_documents': q_fingerprint_documents,
        'simhash_documents': q_simhash_documents,
        'minhash_pairs_documents': q_minhash_pairs_documents,
        'embedding_near_dup': q_embedding_near_dup,
        'drift_lineitem': q_drift_lineitem,
        'image_flagship': q_image_flagship,
    }


def oracle_sql() -> dict[str, str]:
    ann_query = '[' + ', '.join(
        '{:.1f}'.format(v) for v in _ANN_QUERY) + ']::FLOAT[]'
    return {
        'stats_lineitem': """
            SELECT count(*) AS n_rows,
                   count(*) - count(l_quantity) AS n_null_qty,
                   ROUND(min(l_quantity), 3) AS min_qty,
                   ROUND(max(l_quantity), 3) AS max_qty,
                   ROUND(sum(l_quantity), 2) AS sum_qty,
                   ROUND(avg(l_extendedprice), 4) AS avg_price
            FROM lineitem
        """,
        'range_violations_lineitem': """
            SELECT CAST(l_orderkey AS VARCHAR) AS key, 'maximum' AS rule
              FROM lineitem WHERE l_quantity > 45
            UNION ALL
            SELECT CAST(l_orderkey AS VARCHAR) AS key, 'maximum' AS rule
              FROM lineitem WHERE l_discount > 0.08
            UNION ALL
            SELECT CAST(l_orderkey AS VARCHAR) AS key, 'minimum' AS rule
              FROM lineitem WHERE l_extendedprice < 1000
        """,
        'enum_orders': """
            SELECT o_orderstatus, count(*) AS n
            FROM orders
            WHERE o_orderstatus NOT IN ('O', 'F')
            GROUP BY o_orderstatus
        """,
        'minlength_documents': """
            SELECT CAST(doc_id AS VARCHAR) AS key
            FROM documents WHERE length(text) < 100
        """,
        'pattern_customer': """
            SELECT CAST(c_custkey AS VARCHAR) AS key
            FROM customer
            WHERE NOT regexp_matches(c_name, '^Customer#0000000[0-9]{2}$')
        """,
        'json_props_events': """
            SELECT CAST(event_id AS VARCHAR) AS key
            FROM events WHERE TRY_CAST(props AS JSON) IS NULL
        """,
        'referential_orders': """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        """,
        'unique_events': """
            SELECT event_id, count(*) AS n FROM events
            GROUP BY event_id HAVING count(*) > 1
        """,
        'dedup_exact_documents': """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        'token_count_documents': """
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> '')) AS n_tokens
            FROM documents
        """,
        'quality_documents': """
            SELECT doc_id,
                   ROUND(CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                              AS DOUBLE) / greatest(length(text), 1), 4)
                       AS alpha_ratio
            FROM documents
        """,
        'topk_documents': """
            SELECT doc_id, n_chars FROM documents
            ORDER BY n_chars DESC, doc_id LIMIT 10
        """,
        'group_stats_lineitem': """
            SELECT l_returnflag, ROUND(sum(l_quantity), 2) AS sum_qty,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        'embedding_dims': """
            SELECT CAST(vec_id AS VARCHAR) AS key
            FROM embeddings WHERE len(embedding) <> 64
        """,
        'ann_topk': """
            SELECT vec_id,
                   ROUND(list_cosine_similarity(embedding, {q}), 4) AS sim
            FROM embeddings
            ORDER BY list_cosine_similarity(embedding, {q}) DESC, vec_id
            LIMIT 10
        """.format(q=ann_query),
        'events_value_high': """
            SELECT CAST(event_id AS VARCHAR) AS key, 'maximum' AS rule
            FROM events WHERE value > 400
        """,
        'windowed_events': """
            SELECT event_type,
                   CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window,
                   count(*) AS n,
                   ROUND(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        'sessions_events': """
            WITH deltas AS (
                SELECT user_id, epoch_us(ts) AS tsu,
                       CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                 > 1800000000
                            OR lag(epoch_us(ts)) OVER w IS NULL
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), numbered AS (
                SELECT user_id, tsu,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY tsu
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM deltas
            )
            SELECT user_id, min(tsu) AS session_start,
                   max(tsu) AS session_end, count(*) AS n
            FROM numbered GROUP BY user_id, sid
        """,
    }
