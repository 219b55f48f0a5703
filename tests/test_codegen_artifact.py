"""Straight-line ``compile_to_code`` artifact: differential parity vs the
scalar interpreter (itself reference-parity tested) over the FULL
conformance corpus, for every flag combination the emitter covers, plus
the documented fallbacks to the vendored-runtime artifact.

The comparison is exact: verdict, transformed output (defaults,
content decode) AND the full exception payload (message, value, name,
definition, rule)."""

import copy
import json
import os
import types

import pytest

import python_fastjsonschema_ray as engine
from python_fastjsonschema_ray.exceptions import (
    JsonSchemaDefinitionException,
    JsonSchemaValueException,
)

HERE = os.path.dirname(__file__)
DRAFT_URI = {4: 'http://json-schema.org/draft-04/schema',
             6: 'http://json-schema.org/draft-06/schema',
             7: 'http://json-schema.org/draft-07/schema',
             2019: None}

_mod_counter = [0]


def _load(code):
    _mod_counter[0] += 1
    mod = types.ModuleType('gen_artifact_{}'.format(_mod_counter[0]))
    exec(compile(code, '<generated>', 'exec'), mod.__dict__)
    return mod


def _outcome(validate, data):
    try:
        return ('ok', validate(copy.deepcopy(data)))
    except JsonSchemaValueException as e:
        return ('fail', (e.message, e.value, e.name, e.definition, e.rule))
    except Exception as e:                               # noqa: BLE001
        return ('crash', type(e).__name__)


def _groups(draft):
    with open(os.path.join(HERE, 'conformance',
                           'draft{}.json'.format(draft))) as f:
        return json.load(f)


def _schema_for(group, draft):
    schema = copy.deepcopy(group['schema'])
    if isinstance(schema, dict) and DRAFT_URI[draft]:
        schema.setdefault('$schema', DRAFT_URI[draft])
    return schema


@pytest.mark.parametrize('draft', (4, 6, 7, 2019))
def test_artifact_matches_scalar_over_conformance_corpus(draft):
    checked = 0
    for group in _groups(draft):
        schema = _schema_for(group, draft)
        try:
            scalar_v = engine.compile(copy.deepcopy(schema))
            code = engine.compile_to_code(copy.deepcopy(schema))
        except JsonSchemaDefinitionException:
            continue
        assert '_EMBEDDED_RUNTIME' not in code, (
            'straight-line emitter unexpectedly fell back for '
            + group['description'])
        mod = _load(code)
        for t in group['tests']:
            got = _outcome(mod.validate, t['data'])
            want = _outcome(scalar_v, t['data'])
            assert got == want, (
                'artifact != scalar at {} / {}\nwant: {!r}\ngot:  {!r}'
                .format(group['description'], t['description'], want, got))
            checked += 1
    assert checked > 500


@pytest.mark.parametrize('flags', (
    {'detailed_exceptions': False},
    {'use_default': False},
    {'use_formats': False},
), ids=lambda f: next(iter(f)))
def test_artifact_flag_variants(flags):
    for group in _groups(7)[:120]:
        schema = _schema_for(group, 7)
        try:
            scalar_v = engine.compile(copy.deepcopy(schema), **flags)
            code = engine.compile_to_code(copy.deepcopy(schema), **flags)
        except JsonSchemaDefinitionException:
            continue
        mod = _load(code)
        for t in group['tests']:
            assert _outcome(mod.validate, t['data']) == \
                _outcome(scalar_v, t['data'])


def test_collect_mode_falls_back_to_blob():
    code = engine.compile_to_code({'type': 'integer'}, fast_fail=False)
    assert '_EMBEDDED_RUNTIME' in code
    mod = _load(code)
    assert mod.validate(3) == 3


def test_callable_formats_fall_back_to_blob():
    code = engine.compile_to_code({'format': 'even'},
                                  formats={'even': lambda v: True})
    assert '_EMBEDDED_RUNTIME' in code


def test_plugin_keyword_falls_back_to_blob():
    from python_fastjsonschema_ray.functions import plugins

    def check_value(value, definition):
        return None

    plugins.register_keyword('artifactTestKw', check_value=check_value)
    try:
        code = engine.compile_to_code({'artifactTestKw': 1})
        assert '_EMBEDDED_RUNTIME' in code
    finally:
        plugins.unregister_keyword('artifactTestKw')


def test_artifact_is_small_and_readable():
    """The reference's artifact spirit: a 3-keyword schema should produce
    a short human-readable module, not a 24 KB base64 blob."""
    code = engine.compile_to_code(
        {'type': 'string', 'minLength': 2, 'pattern': '^a'})
    assert '_EMBEDDED_RUNTIME' not in code
    assert 'base64.b64decode' not in code    # no blob loader
    assert len(code) < 8000
    assert 'def validate(data' in code
    assert "name + ' must match pattern ^a'" in code


def test_recursive_ref_artifact():
    schema = {'$ref': '#/definitions/node',
              'definitions': {'node': {
                  'properties': {'next': {'$ref': '#/definitions/node'},
                                 'v': {'type': 'integer'}}}},
              '$schema': 'http://json-schema.org/draft-07/schema'}
    code = engine.compile_to_code(copy.deepcopy(schema))
    assert '_EMBEDDED_RUNTIME' not in code
    mod = _load(code)
    ok = {'v': 1, 'next': {'v': 2, 'next': {'v': 3}}}
    assert mod.validate(copy.deepcopy(ok)) == ok
    with pytest.raises(JsonSchemaValueException) as e:
        mod.validate({'v': 1, 'next': {'v': 'x'}})
    assert e.value.name == 'data.next.v'
    assert e.value.rule == 'type'
