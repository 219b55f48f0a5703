"""The reference's golden example groups, run against this engine.

Mirrors ``/root/reference/tests/test_examples.py:29-45``: each group under
the reference's ``tests/examples/`` holds one ``*.schema.json`` plus example
documents; an ``<name>.error`` file beside an example means validation must
fail AND the file's text must be a substring of ``str(exception)``.

The fixtures are read straight from the read-only reference checkout (no
copies); each example also runs through the vectorized table path via a
one-row wrap when the document is Arrow-representable.
"""

import copy
import json
import os
from pathlib import Path

import pyarrow as pa
import pytest

EXAMPLES = Path('/root/reference/tests/examples')

GROUPS = sorted(p.name for p in EXAMPLES.glob('*/')) \
    if EXAMPLES.is_dir() else []


def _group_files(name):
    d = EXAMPLES / name
    schema = json.loads(next(d.glob('*.schema.json')).read_text('utf-8'))
    cases = []
    for e in sorted(d.glob('*.json')):
        if e.name.endswith('.schema.json'):
            continue
        err = e.with_suffix('.error')
        cases.append((e.name, json.loads(e.read_text('utf-8')),
                      err.read_text('utf-8').strip() if err.exists() else None))
    return schema, cases


@pytest.mark.skipif(not GROUPS, reason='reference examples not present')
@pytest.mark.parametrize('group', GROUPS)
def test_example_group_scalar(group):
    import python_fastjsonschema_ray as engine

    schema, cases = _group_files(group)
    validator = engine.compile(copy.deepcopy(schema))
    for name, doc, error_substr in cases:
        if error_substr is None:
            validator(copy.deepcopy(doc))
        else:
            with pytest.raises(engine.JsonSchemaException) as exc_info:
                validator(copy.deepcopy(doc))
            assert error_substr in str(exc_info.value).strip(), (
                group, name, error_substr, str(exc_info.value))


@pytest.mark.skipif(not GROUPS, reason='reference examples not present')
@pytest.mark.parametrize('group', GROUPS)
def test_example_group_vector(reference, group):
    from .test_vector_parity import assert_table_parity

    schema, cases = _group_files(group)
    wrapped = {'properties': {'col': copy.deepcopy(schema)}}
    for key in ('definitions', '$schema'):
        if isinstance(schema, dict) and key in schema:
            wrapped[key] = copy.deepcopy(schema[key])
    covered = 0
    for name, doc, _ in cases:
        try:
            col = pa.array([doc])
        except Exception:
            continue
        assert_table_parity(reference, wrapped, pa.table({'col': col}),
                            fast_fail=True)
        covered += 1
    if not covered:
        # e.g. issue-109's FHIR documents: deep heterogeneous nesting that
        # Arrow cannot infer as one column type — scalar path covers them.
        pytest.skip('no example document was Arrow-representable')
