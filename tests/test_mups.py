import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.ops.mups import mups, tdmfv_classification, tdmfv_n_est

from .oracles import tdmfv_cls_oracle, tdmfv_n_est_oracle


def _random_patches(rng, B, N, n_eff_max=None):
    """Zero-padded patches the way the data pipeline produces them."""
    pts = np.zeros((B, N, 3), dtype=np.float64)
    if n_eff_max is None:
        n_eff = np.full((B,), N, dtype=np.int64)
    else:
        n_eff = rng.randint(3, n_eff_max + 1, size=(B,))
    for b in range(B):
        pts[b, : n_eff[b]] = rng.uniform(-1, 1, size=(n_eff[b], 3))
    return pts, n_eff


@pytest.mark.parametrize("m,var", [(3, 0.111), (8, 0.0156)])
def test_tdmfv_n_est_matches_oracle_dense(rng, m, var):
    gmm = get_3d_grid_gmm([m, m, m], variance=var)
    w, mu, sigma = gmm.astuple()
    B, N = 4, 64
    pts, n_eff = _random_patches(rng, B, N)
    got = np.asarray(
        tdmfv_n_est(jnp.asarray(pts, jnp.float32), w, mu, sigma, jnp.asarray(n_eff))
    )
    want = tdmfv_n_est_oracle(pts, w, mu, sigma, n_eff)
    assert got.shape == (B, 20 * m ** 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_tdmfv_n_est_matches_oracle_padded(rng):
    gmm = get_3d_grid_gmm([3, 3, 3], variance=0.111)
    w, mu, sigma = gmm.astuple()
    B, N = 6, 48
    pts, n_eff = _random_patches(rng, B, N, n_eff_max=40)
    got = np.asarray(
        tdmfv_n_est(jnp.asarray(pts, jnp.float32), w, mu, sigma, jnp.asarray(n_eff))
    )
    want = tdmfv_n_est_oracle(pts, w, mu, sigma, n_eff)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_tdmfv_n_est_padding_invariance(rng):
    """A patch padded with zeros beyond n_eff must produce the same
    statistics regardless of how much padding is appended (the point of
    the reference's compensation scheme)."""
    gmm = get_3d_grid_gmm([3, 3, 3], variance=0.111)
    w, mu, sigma = gmm.astuple()
    real = rng.uniform(-1, 1, size=(1, 20, 3)).astype(np.float32)
    n_eff = jnp.asarray([20])

    out = []
    for pad in [5, 50]:
        pts = np.concatenate([real, np.zeros((1, pad, 3), np.float32)], axis=1)
        # NOTE: the reference mask is strict (row > n_eff), so the first
        # padded row (index == n_eff) is treated as real; both padded
        # variants share that row, hence outputs must still agree.
        out.append(np.asarray(tdmfv_n_est(jnp.asarray(pts), w, mu, sigma, n_eff)))
    np.testing.assert_allclose(out[0], out[1], atol=1e-6)


def test_tdmfv_n_est_nonflatten_layout(rng):
    gmm = get_3d_grid_gmm([3, 3, 3], variance=0.111)
    w, mu, sigma = gmm.astuple()
    pts, n_eff = _random_patches(rng, 2, 32)
    flat = np.asarray(
        tdmfv_n_est(jnp.asarray(pts, jnp.float32), w, mu, sigma, jnp.asarray(n_eff), flatten=True)
    )
    grid = np.asarray(
        tdmfv_n_est(jnp.asarray(pts, jnp.float32), w, mu, sigma, jnp.asarray(n_eff), flatten=False)
    )
    assert grid.shape == (2, 20, 27)
    np.testing.assert_allclose(flat, grid.reshape(2, -1), atol=0)


def test_tdmfv_n_est_zero_count_is_finite():
    """Fully padded rows (n_eff = 0, inference tail batches) must stay
    finite — deliberate fix over the reference's divide-by-zero."""
    gmm = get_3d_grid_gmm([3, 3, 3], variance=0.111)
    w, mu, sigma = gmm.astuple()
    pts = jnp.zeros((2, 16, 3), jnp.float32)
    out = np.asarray(tdmfv_n_est(pts, w, mu, sigma, jnp.asarray([0, 0])))
    assert np.all(np.isfinite(out))


def test_tdmfv_classification_matches_oracle(rng):
    gmm = get_3d_grid_gmm([5, 5, 5], variance=0.04)
    w, mu, sigma = gmm.astuple()
    pts = rng.uniform(-1, 1, size=(3, 128, 3))
    got = np.asarray(tdmfv_classification(jnp.asarray(pts, jnp.float32), w, mu, sigma))
    want = tdmfv_cls_oracle(pts, w, mu, sigma)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_mups_channel_layout(rng):
    """MuPS must place scale s channel c at grid channel s*20 + c with
    each per-scale block equal to the single-scale statistics reshaped
    [20, K] -> [res,res,res] in C order (parity: experts_n_est.py:66-76)."""
    m = 3
    gmm = get_3d_grid_gmm([m, m, m], variance=0.111)
    w, mu, sigma = gmm.astuple()
    B, N, S = 2, 24, 3
    pts = rng.uniform(-1, 1, size=(B, S * N, 3)).astype(np.float32)
    n_eff = np.full((B, S), N, dtype=np.int32)

    grid = np.asarray(
        mups(jnp.asarray(pts), jnp.asarray(n_eff), w, mu, sigma, n_scales=S, resolution=m)
    )
    assert grid.shape == (B, m, m, m, 20 * S)

    for s in range(S):
        single = np.asarray(
            tdmfv_n_est(
                jnp.asarray(pts[:, s * N : (s + 1) * N]),
                w,
                mu,
                sigma,
                jnp.asarray(n_eff[:, s]),
                flatten=False,
            )
        )  # [B, 20, K]
        expected = np.transpose(
            single.reshape(B, 20, m, m, m), (0, 2, 3, 4, 1)
        )
        np.testing.assert_allclose(
            grid[..., s * 20 : (s + 1) * 20], expected, atol=1e-5
        )


def test_tdmfv_jit_and_grad(rng):
    """The kernel must be differentiable (it sits inside the training
    graph) and jit-cleanly."""
    gmm = get_3d_grid_gmm([3, 3, 3], variance=0.111)
    w, mu, sigma = gmm.astuple()
    pts = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 3)), jnp.float32)
    n_eff = jnp.asarray([16, 12])

    def loss(p):
        return jnp.sum(tdmfv_n_est(p, w, mu, sigma, n_eff) ** 2)

    g = jax.jit(jax.grad(loss))(pts)
    assert np.all(np.isfinite(np.asarray(g)))
