"""Unicode-text robustness + parity: web-scale corpora are not ASCII.

Rebuilds the documents table with CJK / Cyrillic / Arabic / emoji /
combining-mark / zero-width text and (a) sweeps the full query surface
for crashes, (b) re-runs the DuckDB oracle compare for every
documents-table text query — the strongest statement: the engine's
text kernels agree with SQL semantics on multibyte input, not just on
the ASCII synthetic corpus.

This is what caught the byte-vs-codepoint shingle bug: "character
5-gram" Jaccard over UTF-8 byte windows coincides with codepoint
windows on ASCII and silently diverges on CJK (the oracle's
``substr(t, i, 5)`` counts codepoints).
"""

import math
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = '/root/testdata/sf0.001'
TABLES = ('region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings')

SNIPPETS = [
    'Grüße aus München — straße çağrı naïve œuvre',
    '日本語のテキストです。漢字とかなカナ混在。',
    'Привет мир! Это русский текст для теста.',
    'مرحبا بالعالم هذا نص عربي للاختبار',
    '🎉 emoji soup 🐍🔥💾 mixed with text 🌍',
    '한국어 텍스트 샘플입니다 테스트용',
    'Ελληνικά κείμενο δοκιμής με τόνους',
    'ASCII mixed avec français et 中文 and עברית',
    '​ zero​width​ joiners ⁠ here',
    'combining: á é ñ ö diacritics',
]

# Documents-table queries with oracle SQL that read `text` — compared
# against DuckDB on the unicode corpus.
TEXT_ORACLE_QUERIES = (
    'token_count_documents', 'quality_documents', 'normalize_documents',
    'redact_documents', 'minlength_documents', 'maxlength_documents',
    'b64_documents', 'chunk_documents', 'repetition_documents',
    'vocabulary_documents', 'decontaminate_documents',
    'ngram_jaccard_documents', 'tfidf_top_terms_documents',
)


@pytest.fixture(scope='module')
def unicode_sf(tmp_path_factory):
    root = tmp_path_factory.mktemp('sf_uni')
    for t in TABLES:
        tab = pq.read_table(os.path.join(SRC, t + '.parquet'))
        if t == 'documents':
            n = tab.num_rows
            texts = [(SNIPPETS[i % len(SNIPPETS)] + ' ') * (1 + i % 4)
                     + 'doc {}'.format(i) for i in range(n)]
            tab = tab.set_column(tab.schema.names.index('text'), 'text',
                                 pa.array(texts, type=pa.string()))
            tab = tab.set_column(
                tab.schema.names.index('n_chars'), 'n_chars',
                pa.array([len(x) for x in texts], type=pa.int64()))
        pq.write_table(tab.replace_schema_metadata(None),
                       str(root / (t + '.parquet')))
    return str(root)


def _norm(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        rows.append(tuple(
            'nan' if isinstance(v, float) and math.isnan(v)
            else (round(v, 6) if isinstance(v, float) else v)
            for v in row))
    return sorted(map(repr, rows))


def test_text_queries_match_oracle_on_unicode(ray_session, unicode_sf):
    import __ray_entry__ as mod
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            "CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            .format(t=t, sf=unicode_sf))
    queries, oracles = mod.queries(), mod.oracle_sql()
    failures = []
    for name in TEXT_ORACLE_QUERIES:
        mine = queries[name](unicode_sf)
        mine = mine.to_pandas() if hasattr(mine, 'to_pandas') else mine
        theirs = con.execute(oracles[name]).df()
        if sorted(mine.columns) != sorted(theirs.columns):
            failures.append((name, 'columns'))
            continue
        if _norm(mine) != _norm(theirs):
            failures.append((name, 'values', len(mine), len(theirs)))
    assert not failures, failures


def test_shingle_kernels_count_codepoints():
    """Codepoint windows: a 6-codepoint CJK string has exactly 2
    distinct 5-grams; its UTF-8 byte form (18 bytes) would have 14."""
    from python_fastjsonschema_ray.stages.dedup import (
        _batch_shingle_hashes, _shingle_hashes)
    s = '日本語のテキ'
    assert len(_shingle_hashes(s, 5)) == 2
    hashes, segs = _batch_shingle_hashes([s], 5)
    assert len(hashes) == 2 and list(segs) == [0]


def test_langid_detects_scripts_through_ray(ray_session, unicode_sf):
    """End-to-end language ID over the unicode corpus: every document
    built from a non-Latin snippet must classify to that snippet's
    language (script-range detection), never fall through to 'en'."""
    import ray.data
    from python_fastjsonschema_ray.stages.text import LangIdStage

    ds = ray.data.read_parquet(unicode_sf + '/documents.parquet',
                               columns=['doc_id', 'text'])
    out = ds.map_batches(LangIdStage('text'),
                         batch_format='pandas').to_pandas()
    out = out.sort_values('doc_id').reset_index(drop=True)
    # Snippet i cycles with doc_id % len(SNIPPETS); the non-Latin ones:
    expected_by_mod = {1: 'ja', 2: 'ru', 3: 'ar', 5: 'ko', 6: 'el'}
    for mod, lang in expected_by_mod.items():
        got = out[out['doc_id'] % len(SNIPPETS) == mod]['lang_pred']
        assert (got == lang).all(), (lang, got.value_counts().to_dict())
