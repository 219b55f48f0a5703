"""Draft-dialect-specific parity: the same schema body must behave
differently (and identically to the reference) under each $schema."""

import pytest

from .test_scalar_parity import assert_parity

D4 = 'http://json-schema.org/draft-04/schema'
D6 = 'http://json-schema.org/draft-06/schema'
D7 = 'http://json-schema.org/draft-07/schema'

CASES = []
for draft in (D4, D6, D7):
    CASES += [
        # integral floats: integer only since draft-06
        ({'$schema': draft, 'type': 'integer'}, 1.0),
        ({'$schema': draft, 'type': 'integer'}, 1.5),
        # numeric exclusiveMinimum keyword exists since draft-06
        ({'$schema': draft, 'exclusiveMinimum': 5}, 5),
        ({'$schema': draft, 'exclusiveMinimum': 5}, 6),
        # const/contains/propertyNames since draft-06
        ({'$schema': draft, 'const': 42}, 41),
        ({'$schema': draft, 'contains': {'type': 'string'}}, [1, 2]),
        ({'$schema': draft, 'propertyNames': {'maxLength': 1}}, {'ab': 1}),
        # if/then/else since draft-07
        ({'$schema': draft, 'if': {'minimum': 0}, 'then': {'maximum': 5}}, 7),
        # contentEncoding since draft-07
        ({'$schema': draft, 'contentEncoding': 'base64'}, '!!!'),
        # boolean sub-schemas since draft-06
        ({'$schema': draft, 'properties': {'a': False}}, {'a': 1}),
        # format tables differ per draft
        ({'$schema': draft, 'format': 'date'}, 'not-a-date'),
        ({'$schema': draft, 'format': 'json-pointer'}, 'a/bad/pointer'),
        ({'$schema': draft, 'format': 'uuid'}, 'not-a-uuid'),
    ]
# draft-2019-only formats
CASES += [
    ({'format': 'uuid'}, 'not-a-uuid'),
    ({'format': 'uuid'}, 'ba6a6b5c-c6b5-4a4e-8b75-52b54a25c10c'),
    ({'format': 'duration'}, 'P1DT2H'),
    ({'format': 'duration'}, 'nope'),
]


@pytest.mark.parametrize('schema,value', CASES)
@pytest.mark.parametrize('fast_fail', [True, False])
def test_dialect_parity(reference, schema, value, fast_fail):
    assert_parity(reference, schema, value, fast_fail=fast_fail)
