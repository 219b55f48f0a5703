"""Property-based differential fuzzing of the vectorized TableValidator
against the reference run row-by-row."""

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from .test_vector_parity import assert_table_parity

ints = st.one_of(st.none(), st.integers(-20, 20))
floats = st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                        width=32).map(float))
texts = st.one_of(st.none(), st.text(alphabet='abc0@. ', max_size=6))
int_lists = st.one_of(st.none(), st.lists(ints, max_size=4))

col_schemas = st.one_of(
    st.fixed_dictionaries({'type': st.sampled_from(
        ['integer', 'number', 'string', 'array', 'null',
         ['integer', 'null'], ['string', 'null']])}),
    st.fixed_dictionaries({'minimum': st.integers(-5, 5)}),
    st.fixed_dictionaries({'maximum': st.integers(-5, 5)}),
    st.fixed_dictionaries({'exclusiveMinimum': st.integers(-5, 5)}),
    st.fixed_dictionaries({'multipleOf': st.sampled_from([2, 3, 0.5])}),
    st.fixed_dictionaries({'minLength': st.integers(0, 4)}),
    st.fixed_dictionaries({'maxLength': st.integers(0, 4)}),
    st.fixed_dictionaries({'pattern': st.sampled_from(
        ['^a', 'b$', '^[0-9]+$', 'c'])}),
    st.fixed_dictionaries({'format': st.sampled_from(
        ['email', 'ipv4', 'date', 'uuid'])}),
    st.fixed_dictionaries({'enum': st.lists(
        st.one_of(st.none(), st.integers(-3, 3), st.sampled_from(['a', 'b'])),
        min_size=1, max_size=4)}),
    st.fixed_dictionaries({'const': st.one_of(
        st.integers(-3, 3), st.sampled_from(['a', 'b']), st.none())}),
    st.fixed_dictionaries({'minItems': st.integers(0, 3)}),
    st.fixed_dictionaries({'maxItems': st.integers(0, 3)}),
    st.fixed_dictionaries({'uniqueItems': st.just(True)}),
    st.fixed_dictionaries({'items': st.fixed_dictionaries(
        {'minimum': st.integers(-5, 5)})}),
    st.fixed_dictionaries({'contains': st.fixed_dictionaries(
        {'minimum': st.integers(-5, 5)})}),
    st.fixed_dictionaries({'anyOf': st.lists(st.fixed_dictionaries(
        {'minimum': st.integers(-5, 5)}), min_size=1, max_size=3)}),
    st.fixed_dictionaries({'oneOf': st.lists(st.fixed_dictionaries(
        {'multipleOf': st.sampled_from([2, 3])}), min_size=1, max_size=3)}),
    st.fixed_dictionaries({'not': st.fixed_dictionaries(
        {'minimum': st.integers(-5, 5)})}),
    st.fixed_dictionaries({
        'if': st.fixed_dictionaries({'minimum': st.integers(-5, 5)}),
        'then': st.fixed_dictionaries({'multipleOf': st.just(2)}),
        'else': st.fixed_dictionaries({'maximum': st.integers(-5, 5)}),
    }),
)


structs = st.one_of(
    st.none(),
    st.fixed_dictionaries({'a': ints, 'b': texts}))

struct_schemas = st.one_of(
    st.fixed_dictionaries({'type': st.just('object')}),
    st.fixed_dictionaries({'required': st.lists(
        st.sampled_from(['a', 'b', 'zz']), unique=True, max_size=2)}),
    st.fixed_dictionaries({'properties': st.fixed_dictionaries({
        'a': st.fixed_dictionaries({'minimum': st.integers(-5, 5)}),
        'b': st.fixed_dictionaries({'minLength': st.integers(0, 3)}),
    })}),
    st.fixed_dictionaries({'minProperties': st.integers(0, 4)}),
    st.fixed_dictionaries({'propertyNames': st.fixed_dictionaries(
        {'maxLength': st.integers(0, 2)})}),
    st.fixed_dictionaries({'dependencies': st.fixed_dictionaries(
        {'a': st.sampled_from([['b'], ['zz'], False])})}),
    st.fixed_dictionaries({'additionalProperties': st.sampled_from(
        [False, {'type': 'string'}])}),
)

_STRUCT_T = pa.struct([('a', pa.int64()), ('b', pa.string())])


@st.composite
def table_and_schema(draw):
    n = draw(st.integers(1, 8))
    cols = {}
    props = {}
    for name, values, typ in [
        ('i', st.lists(ints, min_size=n, max_size=n), pa.int64()),
        ('f', st.lists(floats, min_size=n, max_size=n), pa.float64()),
        ('s', st.lists(texts, min_size=n, max_size=n), pa.string()),
        ('v', st.lists(int_lists, min_size=n, max_size=n),
         pa.list_(pa.int64())),
    ]:
        if draw(st.booleans()):
            cols[name] = pa.array(draw(values), type=typ)
            props[name] = draw(col_schemas)
    if draw(st.booleans()):
        cols['o'] = pa.array(
            draw(st.lists(structs, min_size=n, max_size=n)), type=_STRUCT_T)
        props['o'] = draw(struct_schemas)
    if not cols:
        cols['i'] = pa.array(draw(
            st.lists(ints, min_size=n, max_size=n)), type=pa.int64())
        props['i'] = draw(col_schemas)
    schema = {'type': 'object', 'properties': props}
    if draw(st.booleans()):
        schema['required'] = draw(st.lists(
            st.sampled_from(sorted(cols) + ['zz']), unique=True, max_size=3))
    return schema, pa.table(cols)


@settings(max_examples=150, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ts=table_and_schema(), fast_fail=st.booleans())
def test_vector_fuzz(reference, ts, fast_fail):
    schema, table = ts
    assert_table_parity(reference, schema, table, fast_fail=fast_fail)
