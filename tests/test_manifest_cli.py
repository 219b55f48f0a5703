"""Checkpoint/resume manifests + CLI surface."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest


def test_plan_hash_stability():
    from python_fastjsonschema_ray.pipelines.manifest import plan_hash
    a = plan_hash({'properties': {'x': {'minimum': 0}}})
    b = plan_hash({'properties': {'x': {'minimum': 0}}})
    c = plan_hash({'properties': {'x': {'minimum': 1}}})
    assert a == b != c


def test_run_validation_job_jsonl_shards(ray_session, tmp_path):
    """The resumable job accepts JSONL shards (the reference's native
    document format) through the format-detecting reader."""
    import json as _json
    from python_fastjsonschema_ray.pipelines.manifest import (
        run_validation_job)
    shards = []
    for i in range(2):
        p = tmp_path / 'in_{}.jsonl'.format(i)
        p.write_text('\n'.join(
            _json.dumps({'id': i * 10 + j, 'v': j - 1}) for j in range(6)))
        shards.append(str(p))
    spec = {'properties': {'v': {'minimum': 0}}}
    out = str(tmp_path / 'out')
    summary = run_validation_job(shards, spec, out, key_column='id')
    assert summary['partitions'] == 2
    assert summary['rows'] == 12
    assert summary['violations'] == 2    # one v=-1 row per shard


def test_run_validation_job_resumes(ray_session, tmp_path):
    import pyarrow as pa
    from python_fastjsonschema_ray.pipelines.manifest import (
        RunManifest, partition_id, plan_hash, run_validation_job)
    # Two input shards.
    shards = []
    for i in range(2):
        p = tmp_path / 'in_{}.parquet'.format(i)
        pq.write_table(pa.table({
            'id': pa.array([i * 10 + j for j in range(10)], type=pa.int64()),
            'v': pa.array([j - 2 for j in range(10)], type=pa.int64()),
        }), p)
        shards.append(str(p))
    spec = {'properties': {'v': {'minimum': 0}}}
    out = str(tmp_path / 'out')
    summary = run_validation_job(shards, spec, out, key_column='id')
    assert summary['partitions'] == 2
    assert summary['rows'] == 20
    assert summary['violations'] == 4   # two rows < 0 per shard

    # Outputs exist per partition (dirs are input-path-keyed).
    p0, p1 = partition_id(shards[0]), partition_id(shards[1])
    assert os.path.exists(os.path.join(out, p0, 'verdicts'))
    assert os.path.exists(os.path.join(out, p1, 'violations'))
    # Violations of shard 0: two rows (v = -2, -1) with full detail.
    vdf = pq.read_table(os.path.join(out, p0, 'violations')).to_pandas()
    assert len(vdf) == 2 and set(vdf['rule']) == {'minimum'}

    # Resume: drop one partition from the manifest, rerun → only it reruns.
    manifest_path = os.path.join(out, '_manifest.json')
    state = json.load(open(manifest_path))
    before = dict(state['partitions'])
    del state['partitions'][p1]
    json.dump(state, open(manifest_path, 'w'))
    summary2 = run_validation_job(shards, spec, out, key_column='id')
    assert summary2['partitions'] == 2
    state2 = json.load(open(manifest_path))
    # The untouched partition keeps its identical lineage record object.
    assert state2['partitions'][p0] == before[p0]

    # Adding a new shard resumes without disturbing finished ones and
    # without re-attributing outputs (the round-1 positional-index bug).
    p_new = tmp_path / 'in_added.parquet'
    pq.write_table(pa.table({
        'id': pa.array([100], type=pa.int64()),
        'v': pa.array([-7], type=pa.int64())}), p_new)
    summary3 = run_validation_job(shards + [str(p_new)], spec, out,
                                  key_column='id')
    assert summary3['partitions'] == 3
    assert summary3['violations'] == 5
    state3 = json.load(open(manifest_path))
    assert state3['partitions'][p0] == before[p0]

    # A tampered lineage record (same part id, different input) refuses.
    state3['partitions'][p0]['input'] = '/somewhere/else.parquet'
    json.dump(state3, open(manifest_path, 'w'))
    with pytest.raises(ValueError):
        run_validation_job(shards, spec, out, key_column='id')
    json.dump(
        dict(state3, partitions={**state3['partitions'],
                                 p0: dict(state3['partitions'][p0],
                                          input=shards[0])}),
        open(manifest_path, 'w'))

    # A different spec refuses to reuse the output dir.
    with pytest.raises(ValueError):
        RunManifest(out, plan_hash({'properties': {'v': {'minimum': 5}}}))


def test_cli_compile_and_validate(tmp_path):
    schema = tmp_path / 'schema.json'
    schema.write_text(json.dumps(
        {'type': 'object', 'properties': {'a': {'type': 'integer'}}}))
    out = subprocess.run(
        [sys.executable, '-m', 'python_fastjsonschema_ray', 'compile',
         str(schema)], capture_output=True, text=True, cwd='/root/repo')
    assert out.returncode == 0, out.stderr
    info = json.loads(out.stdout)
    assert info['status'] == 'ok' and info['draft'] == 2019

    data = tmp_path / 'doc.json'
    data.write_text('{"a": 1}')
    out = subprocess.run(
        [sys.executable, '-m', 'python_fastjsonschema_ray', 'validate',
         '--schema', str(schema), '--data', str(data)],
        capture_output=True, text=True, cwd='/root/repo')
    assert out.returncode == 0
    assert json.loads(out.stdout)['valid'] is True

    data.write_text('{"a": "nope"}')
    out = subprocess.run(
        [sys.executable, '-m', 'python_fastjsonschema_ray', 'validate',
         '--schema', str(schema), '--data', str(data)],
        capture_output=True, text=True, cwd='/root/repo')
    assert out.returncode == 1
    res = json.loads(out.stdout)
    assert res['valid'] is False
    assert 'data.a must be integer' in res['error']


def test_cli_schema_from_stdin(tmp_path):
    """'-' reads the schema from stdin (reference CLI parity)."""
    out = subprocess.run(
        [sys.executable, '-m', 'python_fastjsonschema_ray', 'compile', '-'],
        input=json.dumps({'properties': {'x': {'type': 'string'}}}),
        capture_output=True, text=True, cwd='/root/repo')
    assert out.returncode == 0, out.stderr
    assert json.loads(out.stdout)['status'] == 'ok'


def _even_format(value):
    return int(value) % 2 == 0


def test_plan_hash_callable_flags_stable():
    """Callable flags hash by import path, not memory address — a resume
    in a fresh process must see the same plan hash."""
    from python_fastjsonschema_ray.pipelines.manifest import plan_hash
    a = plan_hash({'properties': {}}, {'formats': {'even': _even_format}})
    b = plan_hash({'properties': {}}, {'formats': {'even': _even_format}})
    assert a == b
    c = plan_hash({'properties': {}}, {'formats': {'odd': _even_format}})
    assert a != c


def test_run_validation_job_callable_flags(ray_session, tmp_path):
    """Callable custom formats survive the job path (no default=str
    stringification): the validator must actually call them."""
    import pyarrow as pa
    from python_fastjsonschema_ray.pipelines.manifest import (
        run_validation_job)
    p = tmp_path / 'in.parquet'
    pq.write_table(pa.table({
        'id': pa.array(list(range(6)), type=pa.int64()),
        's': pa.array(['0', '1', '2', '3', '4', '5']),
    }), p)
    spec = {'properties': {'s': {'type': 'string', 'format': 'even'}}}
    out = str(tmp_path / 'out')
    summary = run_validation_job(
        [str(p)], spec, out, key_column='id',
        flags={'formats': {'even': _even_format}})
    assert summary['rows'] == 6
    assert summary['violations'] == 3      # '1', '3', '5'


def test_violation_file_names_deterministic(ray_session, tmp_path):
    """Two runs over the same shard produce identically-NAMED violation
    files (task-retry idempotence requires name determinism; uuid names
    would double-count on re-execution)."""
    import pyarrow as pa
    from python_fastjsonschema_ray.pipelines.manifest import (
        run_validation_job)
    p = tmp_path / 'in.parquet'
    pq.write_table(pa.table({
        'id': pa.array(list(range(10)), type=pa.int64()),
        'v': pa.array([i - 5 for i in range(10)], type=pa.int64()),
    }), p)
    spec = {'properties': {'v': {'minimum': 0}}}
    names = []
    for run in range(2):
        out = str(tmp_path / 'out_{}'.format(run))
        run_validation_job([str(p)], spec, out, key_column='id')
        part = [d for d in os.listdir(out) if d.startswith('part=')][0]
        viol = os.path.join(out, part, 'violations')
        names.append(sorted(f for f in os.listdir(viol)
                            if f.endswith('.parquet')))
    # Names are structured (task-derived), not uuids.
    assert all(n.startswith('task-') for n in names[0]), names[0]


def test_cli_profile_then_enforce(ray_session, tmp_path):
    """`profile` infers a spec the `run` subcommand can enforce."""
    import pyarrow as pa
    p = tmp_path / 'in.parquet'
    pq.write_table(pa.table({
        'id': pa.array([1, 2, 3], type=pa.int64()),
        'name': pa.array(['aa', 'bb', 'ccc']),
    }), p)
    out = subprocess.run(
        [sys.executable, '-m', 'python_fastjsonschema_ray', 'profile',
         '--input', str(p)],
        capture_output=True, text=True, cwd='/root/repo', check=True)
    spec = json.loads(out.stdout)
    assert spec['properties']['id'] == {
        'type': 'integer', 'minimum': 1, 'maximum': 3}
    assert spec['properties']['name']['maxLength'] == 3
    spec_path = tmp_path / 'spec.json'
    spec_path.write_text(json.dumps(spec))
    run_out = subprocess.run(
        [sys.executable, '-m', 'python_fastjsonschema_ray', 'run',
         '--schema', str(spec_path), '--input', str(p),
         '--out', str(tmp_path / 'out'), '--key', 'id'],
        capture_output=True, text=True, cwd='/root/repo', check=True)
    summary = json.loads(run_out.stdout)
    assert summary['rows'] == 3 and summary['violations'] == 0
