"""Distributed PCA vs a local numpy reference (exact same math)."""

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


def _local_pca(mat, k):
    mean = mat.mean(axis=0)
    cov = np.cov(mat, rowvar=False, ddof=1)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:k]
    comp = eigvec[:, order].T
    idx = np.abs(comp).argmax(axis=1)
    signs = np.sign(comp[np.arange(len(comp)), idx])
    signs[signs == 0] = 1.0
    return comp * signs[:, None], mean, eigval[order]


def test_pca_matches_local_reference(ray_session):
    from python_fastjsonschema_ray.stages.pca import pca_fit
    rng = np.random.default_rng(2)
    # Anisotropic data: distinct spectrum so eigenvectors are unique.
    scales = np.array([9.0, 5.0, 2.0, 1.0, 0.5, 0.1])
    mat = rng.normal(0, 1, (3000, 6)) * scales + rng.normal(0, 1, 6)
    comp, info = pca_fit(_embed_ds(mat, blocks=5), 'embedding', 3)
    exp_comp, exp_mean, exp_ev = _local_pca(mat, 3)
    np.testing.assert_allclose(info['mean'], exp_mean, atol=1e-9)
    np.testing.assert_allclose(info['explained_variance'], exp_ev,
                               atol=1e-7)
    np.testing.assert_allclose(comp, exp_comp, atol=1e-7)
    assert info['n_rows'] == 3000
    ratio = info['explained_variance_ratio']
    assert (np.diff(ratio) <= 1e-12).all() and ratio.sum() <= 1.0 + 1e-9


def test_pca_transform_projects_exactly(ray_session):
    from python_fastjsonschema_ray.stages.pca import pca_fit, pca_transform
    rng = np.random.default_rng(8)
    mat = rng.normal(0, 1, (500, 4)) * np.array([4.0, 2.0, 1.0, 0.3])
    ds = _embed_ds(mat)
    comp, info = pca_fit(ds, 'embedding', 2)
    out = pca_transform(ds, 'embedding', comp, info['mean']).to_pandas()
    out = out.sort_values('vec_id')
    got = np.stack(out['pca'].to_numpy())
    exp = (mat - info['mean']) @ comp.T
    np.testing.assert_allclose(got, exp, atol=1e-9)
    # Projected coordinates are decorrelated with the fitted variances.
    np.testing.assert_allclose(
        np.cov(got, rowvar=False, ddof=1),
        np.diag(info['explained_variance']), atol=1e-7)


def test_pca_principal_axis_recovery(ray_session):
    """A 1-D signal embedded in noise: first component finds it."""
    from python_fastjsonschema_ray.stages.pca import pca_fit
    rng = np.random.default_rng(5)
    direction = np.array([3.0, 4.0, 0.0]) / 5.0
    mat = (rng.normal(0, 10, (2000, 1)) * direction +
           rng.normal(0, 0.1, (2000, 3)))
    comp, info = pca_fit(_embed_ds(mat), 'embedding', 1)
    cos = abs(float(comp[0] @ direction))
    assert cos > 0.999
    assert info['explained_variance_ratio'][0] > 0.99


def test_pca_needs_rows(ray_session):
    from python_fastjsonschema_ray.stages.pca import pca_fit
    with pytest.raises(ValueError, match='at least 2 rows'):
        pca_fit(_embed_ds(np.zeros((1, 3)), blocks=1), 'embedding', 1)
