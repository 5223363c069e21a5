import numpy as np
import pytest

from nestinet_tpu.ops.gmm import (
    GridGMM,
    get_2d_grid_gmm,
    get_3d_grid_gmm,
    get_gmm,
)


def test_grid_gmm_basic():
    m = 8
    gmm = get_3d_grid_gmm([m, m, m], variance=0.0156)
    assert gmm.n_gaussians == m ** 3
    assert gmm.dim == 3
    assert gmm.resolution == m
    np.testing.assert_allclose(gmm.weights.sum(), 1.0, rtol=1e-12)
    np.testing.assert_allclose(gmm.weights, 1.0 / m ** 3)
    np.testing.assert_allclose(gmm.covariances, 0.0156)
    np.testing.assert_allclose(gmm.sigma, np.sqrt(0.0156))


def test_grid_gmm_matches_mgrid_layout():
    """Centers must enumerate exactly like the reference's np.mgrid
    (`utils.py:83-86`): linspace(step-1, 1-step, m) per axis, flattened
    C-order (last axis fastest)."""
    for m, var in [(3, 0.111), (5, 0.04), (8, 0.0156)]:
        step = 1.0 / m
        ref = np.mgrid[
            step - 1 : 1.0 - step : complex(0, m),
            step - 1 : 1.0 - step : complex(0, m),
            step - 1 : 1.0 - step : complex(0, m),
        ]
        ref = np.reshape(ref, [3, -1]).T
        gmm = get_3d_grid_gmm([m, m, m], variance=var)
        np.testing.assert_allclose(gmm.means, ref, atol=1e-12)


def test_grid_gmm_2d():
    gmm = get_2d_grid_gmm([5, 5], variance=0.04)
    assert gmm.n_gaussians == 25
    assert gmm.dim == 2
    step = 1.0 / 5
    ref = np.mgrid[step - 1 : 1 - step : 5j, step - 1 : 1 - step : 5j]
    ref = np.reshape(ref, [2, -1]).T
    np.testing.assert_allclose(gmm.means, ref, atol=1e-12)


def test_grid_gmm_json_roundtrip(tmp_path):
    gmm = get_3d_grid_gmm([3, 3, 3], variance=0.111)
    path = str(tmp_path / "gmm.json")
    gmm.save(path)
    loaded = GridGMM.load(path)
    np.testing.assert_allclose(loaded.weights, gmm.weights)
    np.testing.assert_allclose(loaded.means, gmm.means)
    np.testing.assert_allclose(loaded.covariances, gmm.covariances)


def test_get_gmm_dispatcher(tmp_path, rng):
    # grid: scalar subdivisions, 3D and 2D
    g3 = get_gmm(None, 4, type="grid", variance=0.0625)
    assert g3.n_gaussians == 64 and g3.dim == 3
    g2 = get_gmm(None, 5, type="grid", variance=0.04, dim=2)
    assert g2.n_gaussians == 25 and g2.dim == 2
    # grid: explicit subdivision list
    gl = get_gmm(None, [3, 3, 3], type="grid", variance=0.111)
    assert gl.n_gaussians == 27

    # learn: fits data and caches by size
    pts = np.concatenate(
        [rng.randn(200, 3) * 0.1 + c for c in ([1, 0, 0], [-1, 0, 0])]
    )
    learned = get_gmm(pts, 2, type="learn", cache_dir=str(tmp_path))
    assert learned.n_gaussians == 2
    centers = sorted(learned.means[:, 0].tolist())
    assert centers[0] == pytest.approx(-1.0, abs=0.1)
    assert centers[1] == pytest.approx(1.0, abs=0.1)

    with pytest.raises(ValueError):
        get_gmm(None, [2, 2], type="learn")
    with pytest.raises(ValueError):
        get_gmm(None, 3, type="nope")


def test_fisher_vector_per_point_consistency(rng):
    """Per-point derivatives must sum (over points, with the FV
    normalizations applied afterwards) to the aggregated oracle's
    un-normalized statistics structure: spot-check d_pi against the
    direct responsibility formula."""
    from nestinet_tpu.ops.mups import (
        fisher_vector_per_point_np,
        soft_assignment_np,
    )

    gmm = get_3d_grid_gmm([2, 2, 2], variance=0.25)
    pts = rng.uniform(-1, 1, (32, 3))
    d_pi, d_mu, d_sigma = fisher_vector_per_point_np(pts, gmm)
    assert d_pi.shape == (32, 8)
    assert d_mu.shape == (32, 8, 3)
    assert d_sigma.shape == (32, 8, 3)

    q = soft_assignment_np(pts, gmm)
    np.testing.assert_allclose(
        d_pi, (q - gmm.weights[None]) / np.sqrt(gmm.weights)[None], atol=1e-12
    )
    # responsibilities sum to 1 per point -> d_pi rows sum to a constant
    row = np.sum(d_pi * np.sqrt(gmm.weights)[None], axis=1)
    np.testing.assert_allclose(row, 0.0, atol=1e-10)
