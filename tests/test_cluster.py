"""Distributed Lloyd k-means vs a local numpy reference + planted blobs."""

import numpy as np
import pyarrow as pa
import pytest


def _embed_ds(mat, blocks=4):
    import ray.data
    t = pa.table({
        'vec_id': pa.array(np.arange(len(mat)), type=pa.int64()),
        'embedding': pa.array(
            list(mat), type=pa.list_(pa.float64(), mat.shape[1])),
    })
    return ray.data.from_arrow(t).repartition(blocks)


def _blobs(k=5, per=300, dim=8, spread=0.05, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (k, dim)) * 10
    pts = np.concatenate([
        c + rng.normal(0, spread, (per, dim)) for c in centers])
    labels = np.repeat(np.arange(k), per)
    perm = rng.permutation(len(pts))
    return pts[perm], labels[perm], centers


def _local_lloyd(mat, centroids, iters):
    cents = centroids.copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def test_kmeans_recovers_planted_blobs(ray_session):
    from python_fastjsonschema_ray.stages.cluster import (
        cluster_sizes, kmeans_assign, kmeans_fit)
    mat, labels, centers = _blobs()
    ds = _embed_ds(mat)
    cents, info = kmeans_fit(ds, 'embedding', 5, iters=20, seed=7,
                             init_sample_rows=1500)
    assert info['iterations'] <= 20
    # Each planted center has a fitted centroid within the blob spread.
    d = np.linalg.norm(centers[:, None, :] - cents[None, :, :], axis=2)
    match = d.argmin(axis=1)
    assert len(set(match.tolist())) == 5          # bijection
    assert d.min(axis=1).max() < 0.1
    # Assignments reproduce the planted partition exactly.
    tagged = kmeans_assign(ds, 'embedding', cents)
    df = tagged.to_pandas()
    got = df.sort_values('vec_id')['cluster'].to_numpy()
    remap = {pc: int(match[pc]) for pc in range(5)}
    assert (got == np.vectorize(remap.get)(labels)).all()
    sizes = cluster_sizes(tagged, 5)
    assert sizes.sum() == len(mat)
    assert sorted(sizes.tolist()) == [300] * 5


def test_kmeans_matches_local_lloyd_exactly(ray_session):
    """Same init, tol=0: the distributed update rule is the same math as
    the local reference (per-cluster mean), to FP-fold tolerance."""
    from python_fastjsonschema_ray.stages.cluster import kmeans_fit
    rng = np.random.default_rng(1)
    mat = rng.normal(0, 1, (800, 6))
    init = mat[:7].copy()
    got, info = kmeans_fit(_embed_ds(mat, blocks=5), 'embedding', 7,
                           iters=4, tol=0.0, init_centroids=init)
    exp = _local_lloyd(mat, init, 4)
    np.testing.assert_allclose(got, exp, atol=1e-9)
    assert info['iterations'] == 4


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    from python_fastjsonschema_ray.stages.cluster import kmeans_fit
    mat = np.concatenate([np.zeros((50, 3)), np.ones((50, 3))])
    far = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [99.0, 99.0, 99.0]])
    cents, _ = kmeans_fit(_embed_ds(mat, blocks=2), 'embedding', 3,
                          iters=3, tol=0.0, init_centroids=far)
    np.testing.assert_allclose(cents[2], [99.0, 99.0, 99.0])
    np.testing.assert_allclose(cents[0], np.zeros(3), atol=1e-12)
    np.testing.assert_allclose(cents[1], np.ones(3), atol=1e-12)


def test_kmeans_deterministic(ray_session):
    from python_fastjsonschema_ray.stages.cluster import kmeans_fit
    mat, _, _ = _blobs(k=3, per=100, dim=4, seed=9)
    ds = _embed_ds(mat)
    a, _ = kmeans_fit(ds, 'embedding', 3, iters=6, seed=5)
    b, _ = kmeans_fit(ds, 'embedding', 3, iters=6, seed=5)
    np.testing.assert_array_equal(a, b)


def test_kmeans_spherical_unit_centroids(ray_session):
    from python_fastjsonschema_ray.stages.cluster import (
        kmeans_assign, kmeans_fit)
    rng = np.random.default_rng(4)
    mat = rng.normal(0, 1, (400, 5))
    ds = _embed_ds(mat)
    cents, _ = kmeans_fit(ds, 'embedding', 4, iters=5, seed=2,
                          normalize=True)
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0,
                               atol=1e-9)
    tagged = kmeans_assign(ds, 'embedding', cents, normalize=True)
    df = tagged.to_pandas()
    # Spherical assignment == max cosine against the centroids.
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    exp = np.argmax(m @ cents.T, axis=1)
    got = df.sort_values('vec_id')['cluster'].to_numpy()
    assert (got == exp).all()


def test_kmeans_early_stop(ray_session):
    """Perfectly separated data converges in < iters passes."""
    from python_fastjsonschema_ray.stages.cluster import kmeans_fit
    mat = np.concatenate([np.zeros((40, 2)), np.full((40, 2), 9.0)])
    init = np.array([[0.1, 0.1], [8.9, 8.9]])
    _, info = kmeans_fit(_embed_ds(mat, blocks=2), 'embedding', 2,
                         iters=50, tol=1e-9, init_centroids=init)
    assert info['iterations'] <= 3


def test_cluster_balanced_sample(ray_session):
    """Every planted blob contributes exactly n docs, chosen by the
    deterministic hash order (reproducible across runs)."""
    import numpy as np
    import pandas as pd
    import ray.data
    from python_fastjsonschema_ray.stages.cluster import (
        cluster_balanced_sample)

    rng = np.random.default_rng(2)
    blobs = []
    for c, centre in enumerate([(10, 0), (-10, 0), (0, 12)]):
        pts = rng.normal(0, 0.3, (40, 2)) + np.asarray(centre)
        blobs.append(pd.DataFrame({
            'id': np.arange(c * 40, c * 40 + 40, dtype='int64'),
            # plain lists -> Arrow list<double>, the embeddings schema
            # (numpy arrays would become the tensor extension type)
            'embedding': [list(map(float, p)) for p in pts],
        }))
    df = pd.concat(blobs, ignore_index=True)
    ds = ray.data.from_pandas(df).repartition(4)

    out = cluster_balanced_sample(ds, 'id', 'embedding', k=3,
                                  n_per_cluster=5).to_pandas()
    assert len(out) == 15
    sizes = out.groupby('cluster').size()
    assert sorted(sizes) == [5, 5, 5]
    # each true blob is represented (clusters align with blobs)
    blob_of = out['id'] // 40
    assert blob_of.nunique() == 3

    again = cluster_balanced_sample(ds, 'id', 'embedding', k=3,
                                    n_per_cluster=5).to_pandas()
    assert sorted(again['id']) == sorted(out['id'])
