"""Differential parity: the vectorized TableValidator vs the reference
compiler applied row-by-row to the same table.

For every (schema, arrow table) case, each row (``to_pylist`` dict) is
validated by the reference; the per-row verdict and the full first-violation
payload (fast-fail) or ordered error list (collect mode) must match the
engine's vectorized batch output exactly."""

import copy

import numpy as np
import pyarrow as pa
import pytest

from python_fastjsonschema_ray.pipelines.validate import TableValidator


def reference_row_outcomes(reference, schema, rows, fast_fail=True,
                           handlers=None):
    validator = reference.compile(copy.deepcopy(schema), fast_fail=fast_fail,
                                  handlers=handlers or {})
    outcomes = []
    for row in rows:
        try:
            out = validator(copy.deepcopy(row))
            outcomes.append(('ok', out))
        except Exception as exc:
            kind = type(exc).__name__
            if kind == 'JsonSchemaValueException':
                outcomes.append(('fail', [
                    (exc.name, exc.message, exc.rule, exc.definition, exc.value)]))
            elif kind == 'JsonSchemaValuesException':
                outcomes.append(('fail', [
                    (e.name, e.message, e.rule, e.definition, e.value)
                    for e in exc.errors]))
            else:
                outcomes.append(('crash', kind))
    return outcomes


def assert_table_parity(reference, schema, table, fast_fail=True,
                        check_transform=False, handlers=None):
    from python_fastjsonschema_ray.exceptions import (
        JsonSchemaDefinitionException)
    try:
        tv = TableValidator(copy.deepcopy(schema), table.schema,
                            fast_fail=fast_fail, handlers=handlers or {})
    except JsonSchemaDefinitionException as exc:
        # Definition-exception parity: some schemas are rejected at compile
        # time (e.g. a pointer that no longer resolves once the schema is
        # relocated under a wrapper, reached through the exception-payload
        # ref expansion).  The engine is faithful iff the reference rejects
        # the SAME schema the same way.
        with pytest.raises(Exception) as ref_exc:
            reference.compile(copy.deepcopy(schema), fast_fail=fast_fail,
                              handlers=handlers or {})
        assert type(ref_exc.value).__name__ == 'JsonSchemaDefinitionException'
        assert str(ref_exc.value) == str(exc), (
            'compile-time rejection message mismatch: engine {!r} vs '
            'reference {!r}'.format(str(exc), str(ref_exc.value)))
        return
    result = tv.validate_batch(table)
    from python_fastjsonschema_ray.functions.arrowutil import pylist_json
    rows = [dict(zip(table.schema.names, vals)) for vals in zip(*[
        pylist_json(table.column(c).combine_chunks())
        for c in table.schema.names])] if table.num_rows else []
    expected = reference_row_outcomes(reference, schema, rows,
                                      fast_fail=fast_fail,
                                      handlers=handlers)

    by_row = {}
    for r, rec in result.records:
        by_row.setdefault(r, []).append(rec)

    for i, (kind, payload) in enumerate(expected):
        ctx = 'row {} of schema {!r}: value {!r}'.format(i, schema, rows[i])
        if kind == 'ok':
            assert result.valid[i], 'engine flagged valid row invalid: ' + ctx \
                + ' got {!r}'.format(by_row.get(i))
            assert i not in by_row, ctx
        elif kind == 'fail':
            assert not result.valid[i], \
                'engine missed invalid row: ' + ctx + \
                ' expected {!r}'.format(payload)
            got = by_row.get(i, [])
            assert got == payload, (
                'violation mismatch: ' + ctx
                + '\nexpected: {!r}\ngot:      {!r}'.format(payload, got))
        # 'crash' rows: engine behaviour unspecified, skip.

    if check_transform:
        out_rows = result.output.to_pylist()
        for i, (kind, payload) in enumerate(expected):
            if kind == 'ok':
                assert out_rows[i] == payload, (
                    'transform mismatch row {}: {!r} != {!r}'.format(
                        i, out_rows[i], payload))


CASES = []


def case(schema, table):
    CASES.append((schema, table))


# Scalar columns -----------------------------------------------------------
case(
    {'type': 'object', 'properties': {
        'a': {'type': 'integer', 'minimum': 0, 'maximum': 10},
        'b': {'type': 'string', 'minLength': 2, 'maxLength': 4},
    }, 'required': ['a', 'b']},
    pa.table({
        'a': pa.array([1, -5, 11, None, 3], type=pa.int64()),
        'b': pa.array(['ok', 'x', 'toolong', 'ab', None], type=pa.string()),
    }))

case(
    {'properties': {
        'n': {'type': 'number', 'exclusiveMinimum': 0, 'multipleOf': 3},
    }},
    pa.table({'n': pa.array([3.0, 0.0, 7.0, -3.0, 9.0], type=pa.float64())}))

case(
    {'properties': {'n': {'multipleOf': 0.01}}},
    pa.table({'n': pa.array([19.01, 19.015, 0.07, 1.0], type=pa.float64())}))

case(
    {'properties': {'s': {'pattern': '^a+$'}}},
    pa.table({'s': pa.array(['aaa', 'aab', 'aaa\n', '', None])}))

case(
    {'properties': {'s': {'format': 'email'}}},
    pa.table({'s': pa.array(['a@b.cz', 'nope', 'a..b@c.com', None])}))

case(
    {'properties': {'s': {'format': 'ipv4'}}},
    pa.table({'s': pa.array(['1.2.3.4', '087.1.1.1', '1.2.3.256', 'x'])}))

case(
    {'properties': {'s': {'enum': ['O', 'F', 'P']},
                    'i': {'enum': [1, 2, 3]}}},
    pa.table({'s': pa.array(['O', 'X', None, 'F']),
              'i': pa.array([1, 5, 2, None], type=pa.int64())}))

case(
    {'properties': {'f': {'enum': [1, 2]}}},
    pa.table({'f': pa.array([1.0, 2.0, 2.5], type=pa.float64())}))

case(
    {'properties': {'b': {'enum': [True]}, 'c': {'const': 42}}},
    pa.table({'b': pa.array([True, False, None]),
              'c': pa.array([42, 41, None], type=pa.int64())}))

case(
    {'properties': {'i': {'type': 'integer'}}},
    pa.table({'i': pa.array([1.0, 1.5, None], type=pa.float64())}))

case(
    {'$schema': 'http://json-schema.org/draft-04/schema',
     'properties': {'i': {'type': 'integer'}}},
    pa.table({'i': pa.array([1.0, 1.5], type=pa.float64())}))

# List columns -------------------------------------------------------------
case(
    {'properties': {'v': {
        'type': 'array', 'minItems': 1, 'maxItems': 3,
        'items': {'type': 'integer', 'minimum': 0}}}},
    pa.table({'v': pa.array(
        [[1, 2], [], [1, -2, 3], [0, 1, 2, 3], None, [5]],
        type=pa.list_(pa.int64()))}))

case(
    {'properties': {'v': {'uniqueItems': True}}},
    pa.table({'v': pa.array(
        [[1, 2], [1, 1], [], [2, 2, 3], None, [1.5, 1.5]],
        type=pa.list_(pa.float64()))}))

case(
    {'properties': {'v': {'uniqueItems': True}}},
    pa.table({'v': pa.array(
        [['a', 'b'], ['a', 'a'], [None, None], ['x']],
        type=pa.list_(pa.string()))}))

case(
    {'properties': {'v': {'contains': {'type': 'integer', 'minimum': 5}}}},
    pa.table({'v': pa.array(
        [[1, 7], [1, 2], [], None, [5]], type=pa.list_(pa.int64()))}))

case(
    {'properties': {'v': {
        'items': [{'type': 'integer'}, {'minimum': 10}],
        'additionalItems': {'maximum': 2}}}},
    pa.table({'v': pa.array(
        [[1, 11, 2, 1], [1, 5], [1, 11, 5], [], [1]],
        type=pa.list_(pa.int64()))}))

case(
    {'properties': {'v': {
        'items': [{'type': 'integer'}], 'additionalItems': False}}},
    pa.table({'v': pa.array([[1], [1, 2], []], type=pa.list_(pa.int64()))}))

# Nested list-of-struct ----------------------------------------------------
case(
    {'properties': {'outer': {
        'type': 'array',
        'items': {'type': 'object',
                  'properties': {'inner': {'type': 'string', 'minLength': 2}},
                  'required': ['inner']}}}},
    pa.table({'outer': pa.array(
        [[{'inner': 'ok'}], [{'inner': 'x'}, {'inner': 'okay'}],
         [], None, [{'inner': None}]],
        type=pa.list_(pa.struct([('inner', pa.string())])))}))

# Nested list-of-list ------------------------------------------------------
case(
    {'properties': {'m': {
        'items': {'items': {'type': 'integer', 'maximum': 9}}}}},
    pa.table({'m': pa.array(
        [[[1, 2], [3]], [[10]], [], [[1], [2, 99, 3]]],
        type=pa.list_(pa.list_(pa.int64())))}))

# Struct columns -----------------------------------------------------------
case(
    {'properties': {'o': {
        'type': 'object',
        'properties': {'x': {'type': 'integer'}, 'y': {'type': 'string'}},
        'required': ['x', 'z'],
    }}},
    pa.table({'o': pa.array(
        [{'x': 1, 'y': 'a'}, {'x': None, 'y': 'b'}, None],
        type=pa.struct([('x', pa.int64()), ('y', pa.string())]))}))

case(
    {'properties': {'o': {
        'properties': {'x': {'minimum': 0}},
        'minProperties': 3, 'maxProperties': 1,
    }}},
    pa.table({'o': pa.array(
        [{'x': 1, 'y': 'a'}, None],
        type=pa.struct([('x', pa.int64()), ('y', pa.string())]))}))

case(
    {'properties': {'o': {
        'patternProperties': {'^m': {'type': 'integer', 'minimum': 0}},
        'additionalProperties': False,
    }}},
    pa.table({'o': pa.array(
        [{'m1': 1, 'other': 2}, {'m1': -1, 'other': None}],
        type=pa.struct([('m1', pa.int64()), ('other', pa.int64())]))}))

case(
    {'properties': {'o': {'propertyNames': {'maxLength': 2}}}},
    pa.table({'o': pa.array(
        [{'abc': 1}], type=pa.struct([('abc', pa.int64())]))}))

# Cross-column composition at the root ------------------------------------
case(
    {'type': 'object',
     'properties': {'a': {'type': 'integer'}, 'b': {'type': 'string'}},
     'dependencies': {'a': {'required': ['b']}},
     'if': {'properties': {'a': {'minimum': 5}}},
     'then': {'properties': {'b': {'minLength': 3}}},
     'else': {'properties': {'b': {'maxLength': 2}}}},
    pa.table({
        'a': pa.array([1, 7, 7, 1], type=pa.int64()),
        'b': pa.array(['xy', 'long enough', 'x', 'too long'], type=pa.string()),
    }))

case(
    {'properties': {'x': {
        'anyOf': [{'type': 'integer', 'minimum': 10},
                  {'type': 'integer', 'maximum': 5}]}}},
    pa.table({'x': pa.array([3, 8, 11, None], type=pa.int64())}))

case(
    {'properties': {'x': {
        'oneOf': [{'multipleOf': 3}, {'multipleOf': 5}]}}},
    pa.table({'x': pa.array([3, 5, 15, 4], type=pa.int64())}))

case(
    {'properties': {'x': {'not': {'type': 'integer', 'minimum': 5}}}},
    pa.table({'x': pa.array([1, 7, None], type=pa.int64())}))

case(
    {'properties': {'x': {'allOf': [{'minimum': 0}, {'maximum': 10}]}}},
    pa.table({'x': pa.array([-1, 5, 11], type=pa.int64())}))

# required against missing column / extra columns -------------------------
case(
    {'required': ['a', 'missing_col']},
    pa.table({'a': pa.array([1, 2], type=pa.int64())}))

case(
    {'properties': {'a': {'type': 'integer'}},
     'additionalProperties': False},
    pa.table({'a': pa.array([1], type=pa.int64()),
              'extra': pa.array(['x'])}))

# $ref ---------------------------------------------------------------------
case(
    {'definitions': {'pos': {'type': 'integer', 'minimum': 1}},
     'properties': {'size': {'$ref': '#/definitions/pos'}}},
    pa.table({'size': pa.array([1, 0, None], type=pa.int64())}))

# Map columns (scalar-fallback path with dict semantics) -------------------
case(
    {'properties': {'m': {
        'type': 'object',
        'patternProperties': {'^x': {'maximum': 3}},
        'minProperties': 1,
        'propertyNames': {'maxLength': 2},
    }}},
    pa.table({'m': pa.array(
        [[('xa', 1), ('y', 2)], [('xa', 5)], [], [('long', 1)], None],
        type=pa.map_(pa.string(), pa.int64()))}))

case(
    {'properties': {'m': {'required': ['k'], 'additionalProperties': False,
                          'properties': {'k': {'minimum': 0}}}}},
    pa.table({'m': pa.array(
        [[('k', 1)], [('k', -1)], [('other', 2)]],
        type=pa.map_(pa.string(), pa.int64()))}))

# Boolean schemas ----------------------------------------------------------
case(
    {'properties': {'x': True, 'y': False}},
    pa.table({'x': pa.array([1], type=pa.int64()),
              'y': pa.array([2], type=pa.int64())}))


@pytest.mark.parametrize('schema,table', CASES)
def test_vector_parity_fast_fail(reference, schema, table):
    assert_table_parity(reference, schema, table, fast_fail=True)


@pytest.mark.parametrize('schema,table', CASES)
def test_vector_parity_collect(reference, schema, table):
    assert_table_parity(reference, schema, table, fast_fail=False)


def test_defaults_missing_column(reference):
    schema = {'properties': {
        'a': {'type': 'integer'},
        'd': {'type': 'integer', 'default': 42},
    }}
    table = pa.table({'a': pa.array([1, 2], type=pa.int64())})
    assert_table_parity(reference, schema, table, check_transform=True)


def test_content_decode_column(reference):
    """Column-level content transforms follow the engine contract: each
    column behaves as if validated as its own root document (the reference's
    transform-visible path, draft07.py:94-135)."""
    schema = {'properties': {
        'p': {'contentEncoding': 'base64'},
    }}
    table = pa.table({'p': pa.array(['aGVsbG8=', '!!!bad!!!', None])})
    tv = TableValidator(copy.deepcopy(schema), table.schema)
    result = tv.validate_batch(table)
    col_validator = reference.compile({'contentEncoding': 'base64'})
    out = result.output.column('p').to_pylist()
    for i, v in enumerate(table.column('p').to_pylist()):
        if result.valid[i] and v is not None:
            assert out[i] == col_validator(v)
    assert list(result.valid) == [True, False, True]
    assert result.records[0][1][1] == 'data.p must be encoded by base64'


def test_content_json_column():
    schema = {'properties': {'j': {'contentMediaType': 'application/json'}}}
    table = pa.table({'j': pa.array(['{"a": 1}', 'not json', None])})
    tv = TableValidator(copy.deepcopy(schema), table.schema)
    result = tv.validate_batch(table)
    assert list(result.valid) == [True, False, True]
    out = result.output.column('j').to_pylist()
    assert out[0] == {'a': 1}


def test_fallback_constructs(reference):
    """Constructs that defeat vectorization still validate correctly via the
    per-column scalar fallback."""
    schema = {'properties': {
        # propertyNames over a non-struct forces nothing; use a deep enum on
        # a struct column (row kernel) and tuple defaults (fallback).
        'o': {'enum': [{'a': 1}]},
    }}
    table = pa.table({'o': pa.array(
        [{'a': 1}, {'a': 2}], type=pa.struct([('a', pa.int64())]))})
    assert_table_parity(reference, schema, table)


def test_key_column_in_violations():
    schema = {'properties': {'v': {'minimum': 0}}}
    table = pa.table({
        'id': pa.array(['r1', 'r2', 'r3']),
        'v': pa.array([1, -1, 2], type=pa.int64()),
    })
    tv = TableValidator(schema, table.schema, key_column='id')
    result = tv.validate_batch(table)
    vt = tv.violations_table(table, result)
    assert vt.num_rows == 1
    rec = vt.to_pylist()[0]
    assert rec['key'] == 'r2'
    assert rec['message'] == 'data.v must be bigger than or equal to 0'
    assert rec['rule'] == 'minimum'
    assert rec['row'] == 1


@pytest.mark.parametrize('fast_fail', [True, False])
def test_ref_inside_propertyNames_and_fallback(reference, fast_fail):
    """$refs inside propertyNames (compile-time sub-evaluation) and inside
    fallback-handled nodes resolve through the SHARED parent registry —
    in-document refs to sibling definitions AND remote refs via handlers
    (round-5 fix: the sub-ScalarCompiler used to rebuild a blind registry
    from the bare subschema)."""
    remotes = {'http://localhost:1234/short.json': {'maxLength': 2}}

    def handler(uri):
        import copy as _copy
        if uri in remotes:
            return _copy.deepcopy(remotes[uri])
        raise LookupError(uri)

    handlers = {'http': handler}
    table = pa.table({'col': pa.array(
        [{'ab': 1}, {'abc': 2}],
        type=pa.struct([('ab', pa.int64()), ('abc', pa.int64())]))})

    indoc = {'$schema': 'http://json-schema.org/draft-07/schema',
             'definitions': {'short': {'maxLength': 2}},
             'properties': {'col': {
                 'propertyNames': {'$ref': '#/definitions/short'}}}}
    assert_table_parity(reference, indoc, table, fast_fail=fast_fail)

    remote = {'$schema': 'http://json-schema.org/draft-07/schema',
              'properties': {'col': {
                  'propertyNames': {
                      '$ref': 'http://localhost:1234/short.json'}}}}
    assert_table_parity(reference, remote, table, fast_fail=fast_fail,
                        handlers=handlers)
