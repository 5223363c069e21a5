import numpy as np

from nestinet_tpu.ops.gmm import GridGMM, get_2d_grid_gmm, get_3d_grid_gmm


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
