"""Differential parity tests: our interpreted scalar validator vs the
reference compiler, across the full keyword inventory (SURVEY.md §2.3) and
its documented quirks. Every case runs BOTH implementations on a deep copy of
the same (schema, value) and compares the full outcome: transformed return
value, or every exception field (message, value, name, rule, definition).
"""

import copy
from decimal import Decimal

import pytest

import python_fastjsonschema_ray as engine


def outcome(compile_fn, schema, value, **kwargs):
    """Run one implementation; normalize the result to a comparable tuple."""
    try:
        validator = compile_fn(copy.deepcopy(schema), **kwargs)
    except ValueError as exc:
        # Both JsonSchemaDefinitionException classes subclass ValueError.
        if type(exc).__name__ != 'JsonSchemaDefinitionException':
            raise
        return ('definition_error', str(exc))
    try:
        result = validator(copy.deepcopy(value))
        return ('ok', result)
    except Exception as exc:
        kind = type(exc).__name__
        if not isinstance(exc, ValueError):
            # Both sides crash identically on reference quirks like
            # Decimal(repr(False)) for multipleOf on bools — compare the
            # crash type rather than erroring the harness.
            return ('crash', kind)
        if kind == 'JsonSchemaValueException':
            return ('violation', exc.message, exc.value, exc.name, exc.rule,
                    exc.definition, exc.rule_definition,
                    exc.path if exc.name is not None else None)
        if kind == 'JsonSchemaValuesException':
            return ('violations', [
                (e.message, e.value, e.name, e.rule, e.definition)
                for e in exc.errors
            ])
        raise


def assert_parity(reference, schema, value, **kwargs):
    theirs = outcome(reference.compile, schema, value, **kwargs)
    ours = outcome(engine.compile, schema, value, **kwargs)
    assert ours == theirs, (
        'parity mismatch for schema={!r} value={!r} kwargs={!r}\n'
        'reference: {!r}\nengine:    {!r}'.format(schema, value, kwargs, theirs, ours)
    )


NUMBER_CASES = [
    ({'type': 'number'}, v) for v in [0, 1, -1, 1.5, True, False, 'x', None, [], {}, Decimal('1.5')]
] + [
    ({'type': 'integer'}, v) for v in [0, 1, 1.0, 1.5, True, 'x', None, Decimal('1')]
] + [
    ({'minimum': 10}, v) for v in [9, 10, 11, 9.999, 'x', None, True]
] + [
    ({'maximum': 10}, v) for v in [9, 10, 11, 10.001, 'nan']
] + [
    ({'minimum': 10, 'exclusiveMinimum': True}, v) for v in [9, 10, 11]
] + [
    ({'maximum': 10, 'exclusiveMaximum': True}, v) for v in [9, 10, 11]
] + [
    ({'exclusiveMinimum': 10}, v) for v in [9, 10, 11]
] + [
    ({'exclusiveMaximum': 10}, v) for v in [9, 10, 11]
] + [
    ({'multipleOf': 3}, v) for v in [0, 3, 4, -9, 1.5, 'x']
] + [
    ({'multipleOf': 0.01}, v) for v in [19.01, 19.015, 1, 0.07]
] + [
    ({'multipleOf': 0.123456789}, v) for v in [1e30]
] + [
    ({'type': 'number', 'minimum': 2.5, 'maximum': 7.5}, v) for v in [2.4, 2.5, 5, 7.5, 7.6]
]

STRING_CASES = [
    ({'type': 'string'}, v) for v in ['', 'abc', 1, None, True, b'x']
] + [
    ({'minLength': 2}, v) for v in ['', 'a', 'ab', 'abc', 5, None, 'é']
] + [
    ({'maxLength': 2}, v) for v in ['', 'ab', 'abc', 5]
] + [
    ({'pattern': '^a*$'}, v) for v in ['', 'aaa', 'aab', 'aaa\n', 5]
] + [
    ({'pattern': 'a+'}, v) for v in ['xax', 'xxx']
] + [
    ({'pattern': '^price: \\$\\d+$'}, v) for v in ['price: $10', 'price: 10']
]

FORMAT_CASES = [
    ({'format': 'email'}, v)
    for v in ['a@b.cz', 'abc', 'a..b@c.com', '@b.cz', 'a@b', 1]
] + [
    ({'format': 'ipv4'}, v)
    for v in ['1.2.3.4', '127.0.0.1', '087.1.1.1', '1.2.3.256', '1.2.3', 'x']
] + [
    ({'format': 'ipv6'}, v) for v in ['::1', '2001:db8::8a2e:370:7334', '12345::', 'x']
] + [
    ({'format': 'hostname'}, v)
    for v in ['example.com', 'sub.example-x.com', '-bad.com', 'a' * 64 + '.com']
] + [
    ({'format': 'date-time'}, v)
    for v in ['2018-02-05T14:17:10.00Z', '2018-02-05t14:17:10z', 'x', '2018-02-05 14:17:10']
] + [
    ({'format': 'uri'}, v) for v in ['http://example.com', 'urn:x', 'not a uri', '//x']
] + [
    ({'format': 'date'}, v) for v in ['2018-12-31', '2018-13-01', 'x']
] + [
    ({'format': 'time'}, v) for v in ['14:17:10Z', '25:99', 'x']
] + [
    ({'format': 'uuid'}, v)
    for v in ['ba6a6b5c-c6b5-4a4e-8b75-52b54a25c10c', 'not-a-uuid']
] + [
    ({'format': 'duration'}, v) for v in ['P1Y2M3DT4H5M6S', 'P', 'P3W', 'x']
] + [
    ({'format': 'json-pointer'}, v) for v in ['/a/b', 'a/b', '']
] + [
    ({'format': 'unknown-format'}, v) for v in ['anything']
] + [
    ({'format': 'regex'}, v) for v in ['^a+$', '[unclosed']
]

ARRAY_CASES = [
    ({'type': 'array'}, v) for v in [[], [1], (1,), 'x', {}, None]
] + [
    ({'minItems': 2}, v) for v in [[], [1], [1, 2], [1, 2, 3], 'xx']
] + [
    ({'maxItems': 2}, v) for v in [[1, 2], [1, 2, 3]]
] + [
    ({'uniqueItems': True}, v)
    for v in [[], [1, 2], [1, 1], [1, True], [True, True], [1, 1.0],
              [[1], [1]], [[1], [2]], [{'a': 1}, {'a': 1}], [{'a': 1}, {'a': 2}],
              ['a', 'b', 'a'], 'xx']
] + [
    ({'uniqueItems': False}, v) for v in [[1, 1]]
] + [
    ({'items': {'type': 'integer'}}, v) for v in [[], [1, 2], [1, 'x'], ['x'], 'xx']
] + [
    ({'items': [{'type': 'integer'}, {'type': 'string'}]}, v)
    for v in [[], [1], [1, 'a'], [1, 'a', 99], ['a', 1], [1, 2]]
] + [
    ({'items': [{'type': 'integer'}], 'additionalItems': {'type': 'string'}}, v)
    for v in [[1, 'a', 'b'], [1, 2], [1]]
] + [
    ({'items': [{'type': 'integer'}], 'additionalItems': False}, v)
    for v in [[1], [1, 2]]
] + [
    ({'items': False}, v) for v in [[], [1]]
] + [
    ({'items': True}, v) for v in [[1]]
] + [
    ({'items': {}}, v) for v in [[1]]
] + [
    ({'contains': {'type': 'integer'}}, v) for v in [[], ['x'], ['x', 1], 'xx']
] + [
    ({'contains': True}, v) for v in [[], [1]]
] + [
    ({'contains': False}, v) for v in [[], [1], 'x']
]

OBJECT_CASES = [
    ({'type': 'object'}, v) for v in [{}, {'a': 1}, [], 'x', None]
] + [
    ({'minProperties': 1}, v) for v in [{}, {'a': 1}, 'x']
] + [
    ({'maxProperties': 1}, v) for v in [{'a': 1}, {'a': 1, 'b': 2}]
] + [
    ({'required': ['a', 'b']}, v)
    for v in [{}, {'a': 1}, {'a': 1, 'b': 2}, {'b': 1}, 'x']
] + [
    ({'properties': {'a': {'type': 'integer'}}}, v)
    for v in [{}, {'a': 1}, {'a': 'x'}, {'b': 'x'}, 'x']
] + [
    ({'properties': {'a': {'type': 'integer'}}, 'additionalProperties': False}, v)
    for v in [{'a': 1}, {'a': 1, 'b': 2}]
] + [
    ({'properties': {'a': {'type': 'integer'}}, 'additionalProperties': {'type': 'string'}}, v)
    for v in [{'a': 1, 'b': 'x'}, {'a': 1, 'b': 2}]
] + [
    ({'additionalProperties': True}, v) for v in [{'a': 1}]
] + [
    ({'patternProperties': {'^x': {'type': 'integer'}}}, v)
    for v in [{'xa': 1}, {'xa': 'b'}, {'ya': 'b'}, {}]
] + [
    ({'patternProperties': {'^x': {'type': 'integer'}}, 'additionalProperties': False}, v)
    for v in [{'xa': 1}, {'xa': 1, 'ya': 2}]
] + [
    ({'patternProperties': {}}, v) for v in [{'a': 1}]
] + [
    ({'propertyNames': {'maxLength': 2}}, v)
    for v in [{}, {'ab': 1}, {'abc': 1}, 'x']
] + [
    ({'propertyNames': True}, v) for v in [{'a': 1}]
] + [
    ({'propertyNames': False}, v) for v in [{}, {'a': 1}]
] + [
    ({'dependencies': {'bar': ['foo']}}, v)
    for v in [{}, {'foo': 1}, {'bar': 1}, {'foo': 1, 'bar': 2}, 'x']
] + [
    ({'dependencies': {'bar': {'required': ['foo']}}}, v)
    for v in [{'bar': 1}, {'bar': 1, 'foo': 2}]
] + [
    ({'dependencies': {'bar': False}}, v) for v in [{'bar': 1}, {}]
] + [
    ({'dependencies': {'bar': True}}, v) for v in [{'bar': 1}]
] + [
    ({'dependencies': {'bar': []}}, v) for v in [{'bar': 1}]
]

COMMON_CASES = [
    ({'enum': ['a', 'b']}, v) for v in ['a', 'c', 1, None]
] + [
    ({'enum': [1, 2]}, v) for v in [1, 1.0, True, 3, '1']
] + [
    ({'enum': [True]}, v) for v in [True, 1, False]
] + [
    ({'enum': [None]}, v) for v in [None, 0, False]
] + [
    ({'enum': [[1, 2]]}, v) for v in [[1, 2], [1, 2.0], [2, 1], [1], (1, 2)]
] + [
    ({'enum': [{'a': 1}]}, v) for v in [{'a': 1}, {'a': 2}, {'a': 1, 'b': 2}, {}]
] + [
    ({'enum': [{}]}, v) for v in [{}, {'a': 1}]
] + [
    ({'enum': [[]]}, v) for v in [[], [1]]
] + [
    ({'const': 42}, v) for v in [42, 42.0, True, 'x']
] + [
    ({'const': 'foo'}, v) for v in ['foo', 'bar']
] + [
    ({'const': [1, 2]}, v) for v in [[1, 2], [2, 1]]
] + [
    ({'type': ['string', 'number']}, v) for v in ['a', 1, True, None, []]
] + [
    ({'type': ['integer', 'boolean']}, v) for v in [1, True, 1.5, 'x']
] + [
    ({'type': 'null'}, v) for v in [None, 0, False, '']
] + [
    ({'type': 'boolean'}, v) for v in [True, False, 0, 1, 'true']
]

COMPOSITION_CASES = [
    ({'allOf': [{'type': 'number'}, {'minimum': 5}]}, v) for v in [4, 5, 'x']
] + [
    ({'anyOf': [{'type': 'number', 'minimum': 10}, {'type': 'number', 'maximum': 5}]}, v)
    for v in [3, 8, 11, 'x']
] + [
    ({'oneOf': [{'type': 'number', 'multipleOf': 3}, {'type': 'number', 'multipleOf': 5}]}, v)
    for v in [3, 5, 15, 4]
] + [
    ({'not': {'type': 'null'}}, v) for v in [None, 42]
] + [
    ({'not': {}}, v) for v in [1]
] + [
    ({'not': True}, v) for v in [1]
] + [
    ({'not': False}, v) for v in [1]
] + [
    ({'if': {'exclusiveMaximum': 0}, 'then': {'minimum': -10}, 'else': {'multipleOf': 2}}, v)
    for v in [-5, -15, 4, 5, 'x']
] + [
    ({'if': {'exclusiveMaximum': 0}, 'then': {'minimum': -10}}, v) for v in [-5, -15, 4]
] + [
    ({'if': {'exclusiveMaximum': 0}, 'else': {'multipleOf': 2}}, v) for v in [-5, 4, 5]
] + [
    (True, v) for v in [1, None]
] + [
    (False, v) for v in [1, None]
] + [
    ({}, v) for v in [1]
]

REF_CASES = [
    ({'properties': {'foo': {'type': 'integer'}, 'bar': {'$ref': '#/properties/foo'}}}, v)
    for v in [{'foo': 1, 'bar': 2}, {'bar': 'x'}]
] + [
    ({'definitions': {'positiveInteger': {'type': 'integer', 'minimum': 1}},
      'properties': {'size': {'$ref': '#/definitions/positiveInteger'}}}, v)
    for v in [{'size': 1}, {'size': 0}, {'size': 'x'}]
] + [
    # Recursive schema: linked list of nodes.
    ({'definitions': {'node': {
        'type': 'object', 'required': ['v'],
        'properties': {'v': {'type': 'integer'},
                       'next': {'$ref': '#/definitions/node'}}}},
      '$ref': '#/definitions/node'}, v)
    for v in [{'v': 1}, {'v': 1, 'next': {'v': 2}}, {'v': 1, 'next': {'x': 2}},
              {'v': 1, 'next': {'v': 'bad'}}]
]

CONTENT_CASES = [
    ({'contentEncoding': 'base64'}, v) for v in ['aGVsbG8=', '!!!not-base64!!!', 5]
] + [
    ({'contentMediaType': 'application/json'}, v)
    for v in ['{"a": 1}', 'not json', b'{"b": 2}', 5]
] + [
    ({'contentEncoding': 'base64', 'contentMediaType': 'application/json'}, v)
    for v in ['eyJhIjogMX0=', 'aGVsbG8=']
]

DEFAULT_CASES = [
    ({'properties': {'a': {'type': 'integer', 'default': 42}}}, v)
    for v in [{}, {'a': 1}]
] + [
    ({'properties': {'a': {'default': {'x': [1]}}}}, v) for v in [{}]
] + [
    ({'items': [{'type': 'integer'}, {'type': 'integer', 'default': 7}]}, v)
    for v in [[1], [1, 2], []]
]

DEEP_CASES = [
    ({'type': 'object',
      'properties': {
          'outer': {
              'type': 'array',
              'items': {'type': 'object',
                        'properties': {'inner': {'type': 'string', 'minLength': 2}},
                        'required': ['inner']},
          }}}, v)
    for v in [
        {'outer': []},
        {'outer': [{'inner': 'ok'}]},
        {'outer': [{'inner': 'ok'}, {'inner': 'x'}]},
        {'outer': [{}]},
        {'outer': [{'inner': 5}]},
        {'outer': ['nope']},
    ]
]

ALL_CASES = (
    NUMBER_CASES + STRING_CASES + FORMAT_CASES + ARRAY_CASES + OBJECT_CASES
    + COMMON_CASES + COMPOSITION_CASES + REF_CASES + CONTENT_CASES
    + DEFAULT_CASES + DEEP_CASES
)


@pytest.mark.parametrize('schema,value', ALL_CASES,
                         ids=lambda x: repr(x)[:60] if not isinstance(x, tuple) else None)
def test_parity_fast_fail(reference, schema, value):
    assert_parity(reference, schema, value)


@pytest.mark.parametrize('schema,value', ALL_CASES,
                         ids=lambda x: repr(x)[:60] if not isinstance(x, tuple) else None)
def test_parity_collect_errors(reference, schema, value):
    assert_parity(reference, schema, value, fast_fail=False)


@pytest.mark.parametrize('schema,value', [
    ({'properties': {'a': {'type': 'integer', 'default': 42}}}, {}),
    ({'items': [{'type': 'integer', 'default': 7}]}, []),
])
def test_parity_no_default(reference, schema, value):
    assert_parity(reference, schema, value, use_default=False)


@pytest.mark.parametrize('schema,value', FORMAT_CASES)
def test_parity_no_formats(reference, schema, value):
    assert_parity(reference, schema, value, use_formats=False)


@pytest.mark.parametrize('schema,value', [
    ({'type': 'string'}, 1),
    ({'properties': {'a': {'minimum': 3}}}, {'a': 1}),
])
def test_parity_plain_exceptions(reference, schema, value):
    assert_parity(reference, schema, value, detailed_exceptions=False)


def test_parity_custom_formats(reference):
    formats = {
        'my-re': r'[0-9]+',
        'my-fn': lambda value: value.startswith('ok'),
        # Overriding a built-in is allowed (draft04.py:308-315).
        'email': r'.+--.+',
    }
    for schema, value in [
        ({'format': 'my-re'}, '123'),
        ({'format': 'my-re'}, 'abc'),
        ({'format': 'my-fn'}, 'ok yes'),
        ({'format': 'my-fn'}, 'nope'),
        ({'format': 'email'}, 'a--b'),
        ({'format': 'email'}, 'a@b.cz'),
    ]:
        assert_parity(reference, schema, value, formats=formats)


DEFINITION_ERROR_CASES = [
    ({'type': 'frobnicate'}, 1),
    ({'enum': 'abc'}, 1),
    ({'minLength': 'x'}, 'a'),
    ({'maxLength': 'x'}, 'a'),
    ({'minimum': 'x'}, 1),
    ({'maximum': 'x'}, 1),
    ({'multipleOf': 'x'}, 1),
    ({'exclusiveMinimum': 'x'}, 1),
    ({'exclusiveMaximum': 'x'}, 1),
    ({'minItems': 'x'}, []),
    ({'maxItems': 'x'}, []),
    ({'minProperties': 'x'}, {}),
    ({'maxProperties': 'x'}, {}),
    ({'required': 'abc'}, {}),
    ({'required': ['a', 'a']}, {}),
    ({'required': ['b'], 'properties': {'a': {}}, 'additionalProperties': False}, {}),
    ({'properties': {'a': 'nope'}}, {}),
    ({'$ref': '#/nonexistent'}, 1),
]


@pytest.mark.parametrize('schema,value', DEFINITION_ERROR_CASES)
def test_parity_definition_errors(reference, schema, value):
    """Both sides must reject the same bad schemas at compile time (the
    message text may differ; the failure mode must not)."""
    theirs = outcome(reference.compile, schema, value)
    ours = outcome(engine.compile, schema, value)
    assert theirs[0] == 'definition_error', theirs
    assert ours[0] == 'definition_error', ours


def test_parity_draft04_dialect(reference):
    d4 = {'$schema': 'http://json-schema.org/draft-04/schema'}
    cases = [
        # draft-04: a float with integral value is NOT an integer.
        (dict(d4, type='integer'), 1.0),
        (dict(d4, type='integer'), 1),
        # draft-04 has no const/if/contains keywords: silently ignored.
        (dict(d4, const=42), 41),
        (dict(d4, contains={'type': 'integer'}), ['x']),
        (dict(d4, **{'if': {'minimum': 0}, 'then': {'maximum': 1}}), 5),
    ]
    for schema, value in cases:
        assert_parity(reference, schema, value)


def test_transform_return_values(reference):
    """Transforms must return identical data: defaults fill, base64 decode,
    JSON parse (tests/test_integration.py:46-70 model)."""
    cases = [
        ({'properties': {'a': {'default': 1}}, 'required': []}, {}),
        ({'contentEncoding': 'base64'}, 'aGVsbG8='),
        ({'contentMediaType': 'application/json'}, '{"a": [1, 2]}'),
        ({'contentEncoding': 'base64', 'contentMediaType': 'application/json'},
         'eyJhIjogMX0='),
        ({'allOf': [{'contentEncoding': 'base64'}]}, 'aGVsbG8='),
    ]
    for schema, value in cases:
        assert_parity(reference, schema, value)
