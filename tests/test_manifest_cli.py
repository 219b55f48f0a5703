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


def test_run_validation_job_resumes(ray_session, tmp_path):
    import pyarrow as pa
    from python_fastjsonschema_ray.pipelines.manifest import (
        RunManifest, plan_hash, run_validation_job)
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

    # Outputs exist per partition.
    assert os.path.exists(os.path.join(out, 'part=00000', 'verdicts'))
    assert os.path.exists(os.path.join(out, 'part=00001', 'violations'))

    # Resume: drop one partition from the manifest, rerun → only it reruns.
    manifest_path = os.path.join(out, '_manifest.json')
    state = json.load(open(manifest_path))
    before = dict(state['partitions'])
    del state['partitions']['part=00001']
    json.dump(state, open(manifest_path, 'w'))
    summary2 = run_validation_job(shards, spec, out, key_column='id')
    assert summary2['partitions'] == 2
    state2 = json.load(open(manifest_path))
    # part=00000 untouched (identical lineage record object).
    assert state2['partitions']['part=00000'] == before['part=00000']

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
