"""End-to-end flagship pipeline over the synthetic image+caption table."""

import pytest


@pytest.fixture(scope='module')
def image_ds(ray_session):
    from python_fastjsonschema_ray.sources.images import image_dataset
    return image_dataset(2000, seed=42, violation_rate=0.01,
                         shard_size=500).materialize()


def test_flagship_report(image_ds):
    from python_fastjsonschema_ray.pipelines.flagship import run_flagship
    # Reference key set = all non-negative phashes (planted orphans are -1).
    phashes = [r['phash'] for r in
               image_ds.select_columns(['phash']).take_all()
               if r['phash'] is not None and r['phash'] >= 0]
    report, violations = run_flagship(image_ds, reference_phashes=phashes)

    sv = report['schema_violations']
    # Planted: null image_id (type), bad fmt (enum), short caption (minLength).
    assert sv.get('type', 0) > 0
    assert sv.get('enum', 0) > 0
    assert sv.get('minLength', 0) > 0

    cv = report['content_violations']
    assert cv.get('dims', 0) > 0          # planted dim mismatches

    assert report['duplicate_keys'] > 0    # planted (phash, image_id) dups
    assert report['referential_orphans'] > 0

    stats = report['stats']
    assert stats['w']['count'] == 2000
    assert 1 <= float(stats['w']['min'])

    # Combined violation rows carry key/source/rule/message.
    sample = violations.take(1)[0]
    assert set(sample) >= {'key', 'source', 'rule', 'message'}


def test_flagship_drift(image_ds, ray_session):
    import numpy as np
    from python_fastjsonschema_ray.pipelines.flagship import (
        make_width_profile, run_flagship)
    from python_fastjsonschema_ray.sources.images import image_dataset
    profile, edges = make_width_profile(image_ds)
    # Same generator, different rows → same distribution, no drift.
    other = image_dataset(1000, seed=99, violation_rate=0.0, shard_size=500)
    report, _ = run_flagship(other, width_profile=profile, width_edges=edges,
                             stats=False)
    assert not report['drift']['drifted'], report['drift']


def test_image_table_reference_parity(reference):
    """North-rule invariant: per-row pass/fail verdicts AND full violation
    payloads on the image+caption table must match the reference validating
    each row as a document against IMAGE_TABLE_SPEC."""
    from python_fastjsonschema_ray.pipelines.flagship import IMAGE_TABLE_SPEC
    from python_fastjsonschema_ray.sources.images import image_batch
    from .test_vector_parity import assert_table_parity
    table = image_batch(0, 1500, seed=42, violation_rate=0.01)
    for fast_fail in (True, False):
        assert_table_parity(reference, IMAGE_TABLE_SPEC, table,
                            fast_fail=fast_fail)
