"""Pallas MuPS kernel vs the jnp reference implementation.

Runs in interpreter mode on the CPU test backend; the same kernel
compiles natively on TPU (exercised by bench.py / the driver's
compile check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.ops.mups import tdmfv_n_est
from nestinet_tpu.ops.pallas import mups_kernel


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Force interpreter mode for pallas_call on the CPU backend."""
    from jax.experimental.pallas import tpu as pltpu

    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _case(rng, B, N, m, pad=False):
    gmm = get_3d_grid_gmm([m, m, m], variance=(1.0 / m) ** 2)
    w, mu, sigma = gmm.astuple()
    pts = np.zeros((B, N, 3), np.float32)
    if pad:
        n_eff = rng.randint(4, N, size=(B,)).astype(np.int32)
    else:
        n_eff = np.full((B,), N, np.int32)
    for b in range(B):
        pts[b, : n_eff[b]] = rng.uniform(-1, 1, size=(n_eff[b], 3))
    return pts, w, mu, sigma, n_eff


@pytest.mark.parametrize("pad", [False, True])
def test_kernel_matches_jnp(rng, pad):
    pts, w, mu, sigma, n_eff = _case(rng, B=3, N=64, m=4, pad=pad)
    got = np.asarray(
        mups_kernel.tdmfv_n_est_pallas(
            jnp.asarray(pts), jnp.asarray(w), jnp.asarray(mu), jnp.asarray(sigma),
            jnp.asarray(n_eff),
        )
    )
    want = np.asarray(
        tdmfv_n_est(jnp.asarray(pts), w, mu, sigma, jnp.asarray(n_eff), flatten=False)
    )
    assert got.shape == want.shape == (3, 20, 64)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_kernel_grad_matches_jnp(rng):
    pts, w, mu, sigma, n_eff = _case(rng, B=2, N=32, m=3)
    pts_j = jnp.asarray(pts)

    def loss_pallas(p):
        out = mups_kernel.tdmfv_n_est_pallas(
            p, jnp.asarray(w), jnp.asarray(mu), jnp.asarray(sigma), jnp.asarray(n_eff)
        )
        return jnp.sum(out ** 2)

    def loss_ref(p):
        out = tdmfv_n_est(p, w, mu, sigma, jnp.asarray(n_eff), flatten=False)
        return jnp.sum(out ** 2)

    g_pallas = np.asarray(jax.grad(loss_pallas)(pts_j))
    g_ref = np.asarray(jax.grad(loss_ref)(pts_j))
    np.testing.assert_allclose(g_pallas, g_ref, atol=1e-4)


def test_mups_dispatch_pallas_matches_jnp(rng):
    """The multi-scale mups() wrapper gives identical grids through the
    merged-batch pallas path and the vmap-ed jnp path."""
    from nestinet_tpu.ops.mups import mups

    m, n_scales, B, N = 3, 3, 2, 32
    gmm = get_3d_grid_gmm([m, m, m], variance=(1.0 / m) ** 2)
    w, mu, sigma = gmm.astuple()
    pts = rng.uniform(-1, 1, size=(B, n_scales * N, 3)).astype(np.float32)
    n_eff = rng.randint(4, N, size=(B, n_scales)).astype(np.int32)
    for b in range(B):
        for s in range(n_scales):
            pts[b, s * N + n_eff[b, s]: (s + 1) * N] = 0.0

    kwargs = dict(n_scales=n_scales, resolution=m)
    got = np.asarray(
        mups(jnp.asarray(pts), jnp.asarray(n_eff), w, mu, sigma,
             impl="pallas", **kwargs)
    )
    want = np.asarray(
        mups(jnp.asarray(pts), jnp.asarray(n_eff), w, mu, sigma,
             impl="jnp", **kwargs)
    )
    assert got.shape == want.shape == (B, m, m, m, 20 * n_scales)
    np.testing.assert_allclose(got, want, atol=1e-5)
