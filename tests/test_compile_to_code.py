"""compile_to_code round trip: write module → import → validate
(reference model: tests/test_compile_to_code.py:9-47)."""

import importlib.util
import json
import sys

import pytest

import python_fastjsonschema_ray as engine


def _load_module(tmp_path, code, name):
    path = tmp_path / (name + '.py')
    path.write_text(code)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_roundtrip(tmp_path):
    schema = {'type': 'object',
              'properties': {'a': {'type': 'string', 'pattern': '^x'},
                             'b': {'minimum': 2, 'default': 5}},
              'required': ['a']}
    code = engine.compile_to_code(schema)
    mod = _load_module(tmp_path, code, 'generated_validator')
    assert mod.VERSION == engine.VERSION
    assert mod.validate({'a': 'xyz'}) == {'a': 'xyz', 'b': 5}
    with pytest.raises(engine.JsonSchemaValueException) as e:
        mod.validate({'a': 'nope'})
    assert e.value.message == 'data.a must match pattern ^x'


def test_roundtrip_regex_formats(tmp_path):
    code = engine.compile_to_code({'format': 'digits'},
                                  formats={'digits': r'^[0-9]+$'})
    mod = _load_module(tmp_path, code, 'generated_validator2')
    assert mod.validate('123') == '123'
    with pytest.raises(engine.JsonSchemaValueException):
        mod.validate('abc')


def test_bad_schema_fails_at_generation():
    with pytest.raises(engine.JsonSchemaDefinitionException):
        engine.compile_to_code({'type': 'frobnicate'})
