"""Text normalization + PII redaction stages."""

import pyarrow as pa
import pytest


def _ds(texts, blocks=2):
    import ray.data
    return ray.data.from_arrow(pa.table({
        'doc_id': pa.array(range(len(texts)), type=pa.int64()),
        'text': pa.array(texts, type=pa.string()),
    })).repartition(blocks)


def _by_id(ds):
    df = ds.to_pandas().sort_values('doc_id')
    return df


def test_redact_default_rules(ray_session):
    from python_fastjsonschema_ray.stages.clean import redact_text
    out = _by_id(redact_text(_ds([
        'mail me at a.b+c@ex-ample.co.uk today',
        'see https://x.y/z?a=1&b=2 and http://plain.example/p',
        'host 192.168.0.1 and 8.8.8.8',
        'url with mail http://u.example/a@b.com trailing',
        'clean text stays',
        None,
    ]), 'text'))
    got = out['text'].tolist()
    assert got[0] == 'mail me at <EMAIL> today'
    assert got[1] == 'see <URL> and <URL>'
    assert got[2] == 'host <IP> and <IP>'
    # URL rule runs first: the embedded email is part of the URL token.
    assert got[3] == 'url with mail <URL> trailing'
    assert got[4] == 'clean text stays'
    assert got[5] is None


def test_redact_counts_and_out_column(ray_session):
    from python_fastjsonschema_ray.stages.clean import redact_text
    out = _by_id(redact_text(
        _ds(['a@b.io c@d.io', 'no pii']), 'text',
        out_column='scrubbed', count_matches=True))
    assert out['text'].tolist() == ['a@b.io c@d.io', 'no pii']
    assert out['scrubbed'].tolist() == ['<EMAIL> <EMAIL>', 'no pii']
    assert out['email_matches'].tolist() == [2, 0]
    assert out['url_matches'].tolist() == [0, 0]


def test_normalize_text(ray_session):
    from python_fastjsonschema_ray.stages.clean import normalize_text
    out = _by_id(normalize_text(_ds([
        '  Hello\t WORLD \n',
        'already clean',
        '\n\n',
        None,
    ]), 'text'))
    assert out['text'].tolist() == ['hello world', 'already clean',
                                    '', None]


def test_normalize_nfkc(ray_session):
    from python_fastjsonschema_ray.stages.clean import normalize_text
    # U+FB01 LATIN SMALL LIGATURE FI and fullwidth digits fold to ASCII.
    out = _by_id(normalize_text(_ds(['ﬁle １２３', 'Café']), 'text',
                                nfkc=True))
    assert out['text'].tolist() == ['file 123', 'café']


def test_redact_matches_duckdb(ray_session):
    """Same RE2 patterns through DuckDB regexp_replace — exact parity."""
    import duckdb
    from python_fastjsonschema_ray.stages.clean import (
        DEFAULT_PII_RULES, redact_text)
    texts = ['x a@b.co http://u.v/w 1.2.3.4 y', 'nothing here',
             'e@f.org at 10.0.0.255', 'https://q.r/s?t=u@v.wx end']
    got = _by_id(redact_text(_ds(texts), 'text'))['text'].tolist()
    con = duckdb.connect()
    expr = 't'
    for _, pattern, repl in DEFAULT_PII_RULES:
        # DuckDB varchar literals keep backslashes as-is — no escaping.
        expr = "regexp_replace({}, '{}', '{}', 'g')".format(
            expr, pattern, repl)
    exp = [con.execute(
        'SELECT {} FROM (SELECT ? AS t)'.format(expr), [t]).fetchone()[0]
        for t in texts]
    assert got == exp
