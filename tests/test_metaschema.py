"""Validate schemas AGAINST the bundled draft metaschemas — the last
thin conformance area: the metaschemas are real-world recursive
schemas ($ref "#", definitions cross-refs, unions, defaults) read in
place from the reference checkout
(/root/reference/tests/json_schema/metaschemas/, the docs its suite
registers via handler stubs in tests/json_schema/utils.py:28-39)."""

import copy
import json

import pytest

META_DIR = '/root/reference/tests/json_schema/metaschemas'

# Documents to validate against each metaschema: (description, schema
# document, expected-valid under drafts 4/6/7).  Chosen where all three
# drafts agree so one table drives all of them.
DOCS = [
    ('empty schema object', {}, True),
    ('simple typed schema',
     {'type': 'object', 'properties': {'a': {'type': 'integer'}}}, True),
    ('full-featured schema',
     {'type': ['object', 'array'],
      'definitions': {'x': {'enum': [1, 2]}},
      'items': {'$ref': '#/definitions/x'},
      'minItems': 0, 'uniqueItems': True,
      'patternProperties': {'^a': {'minimum': 0}},
      'required': ['a'], 'dependencies': {'a': ['b']}}, True),
    ('type as number invalid', {'type': 123}, False),
    ('type as unknown string invalid', {'type': 'float'}, False),
    ('negative minLength invalid', {'minLength': -1}, False),
    ('non-integer minLength invalid', {'minLength': 1.5}, False),
    ('required with non-string invalid', {'required': [1]}, False),
    ('properties with non-object value invalid',
     {'properties': {'a': []}}, False),
    ('pattern as number invalid', {'pattern': 5}, False),
    ('multipleOf zero invalid', {'multipleOf': 0}, False),
    ('enum as scalar invalid', {'enum': 'x'}, False),
]


def _load_meta(draft):
    path = '{}/draft-0{}/schema.json'.format(META_DIR, draft)
    with open(path) as f:
        return json.load(f)


def _handlers(meta):
    uri = meta['$id' if '$id' in meta else 'id'].rstrip('#')

    def handler(u):
        if u.rstrip('#') == uri:
            return copy.deepcopy(meta)
        raise LookupError(u)

    return {'http': handler, 'https': handler}


@pytest.mark.parametrize('draft', [4, 6, 7])
def test_metaschema_differential(reference, draft):
    import python_fastjsonschema_ray as engine

    meta = _load_meta(draft)
    handlers = _handlers(meta)
    ref_v = reference.compile(copy.deepcopy(meta), handlers=handlers)
    eng_v = engine.compile(copy.deepcopy(meta), handlers=handlers)
    for desc, doc, expected_valid in DOCS:
        ref_out = None
        try:
            ref_v(copy.deepcopy(doc))
            ref_ok = True
        except reference.JsonSchemaValueException as exc:
            ref_ok = False
            ref_out = (exc.name, exc.message, exc.rule)
        eng_out = None
        try:
            eng_v(copy.deepcopy(doc))
            eng_ok = True
        except engine.JsonSchemaValueException as exc:
            eng_ok = False
            eng_out = (exc.name, exc.message, exc.rule)
        assert eng_ok == ref_ok, (draft, desc, ref_out, eng_out)
        assert eng_out == ref_out, (draft, desc)
        # Calibration: the reference must agree with the official
        # validity for every bundled-doc case we assert.
        assert ref_ok == expected_valid, (draft, desc)
