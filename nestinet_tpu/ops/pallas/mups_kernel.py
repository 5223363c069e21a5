"""Fused Pallas TPU kernel for the padding-compensated 3DmFV statistics.

Why a kernel: the jnp formulation in `ops/mups.py` expresses the
statistics as broadcast-then-reduce over a [B, N, K, D] space; XLA fuses
much of it, but the soft-assignment matrix and the three derivative
tensors still stream through HBM between fusions at production sizes
(B=128, N=512, K=512 -> ~130 MB per intermediate).  This kernel keeps
the WHOLE computation for one patch resident in VMEM: the [N, 3] patch,
the [N, K] likelihood/assignment tiles, and the [20, K] moment
accumulators never touch HBM; one program per patch, outputs written
once.

Numerics match `ops.mups.tdmfv_n_est` (same mask semantics, same
normalization order); the unit tests compare against it elementwise.
The op is exposed with a custom VJP whose backward pass differentiates
the jnp reference implementation, so the kernel is usable inside the
training graph too (forward fast path + autodiff-correct backward).

Layout notes (see the TPU tiling constraints in the Pallas guide):
  * points stay in their native [B, N, 3] layout (N on sublanes); the
    [N, K] compute space is formed by [N, 1] x [1, K] slice-broadcasts,
    never by advanced indexing (Mosaic has no general gather);
  * GMM parameters are passed as [3, K] / [1, K] with K on lanes
    (K = 512 for the flagship 8^3 grid -> 4 full lane tiles);
  * per-patch effective counts ride the scalar-prefetch channel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mups import tdmfv_n_est

_EPS = 1e-12


def _kernel(n_eff_ref, pts_ref, mu_ref, sigma_ref, w_ref, out_ref):
    # NOTE on layout: everything below is pure slices + broadcasts —
    # Mosaic has no general gather, so e.g. `pts[0, :, None]` (advanced
    # indexing) must not appear here.  Points ride with N on sublanes
    # and the coordinate axis on lanes; the [N, K] compute space puts
    # K on lanes (full 128-lane tiles for the flagship K=512).
    b = pl.program_id(0)
    n_eff = n_eff_ref[b]

    pts = pts_ref[0]  # [N, 3]
    mu = mu_ref[:]  # [3, K]
    sigma = sigma_ref[:]  # [3, K]
    w = w_ref[:]  # [1, K]

    n = pts.shape[0]
    k = mu.shape[1]
    d_dims = 3

    inv_sigma = 1.0 / sigma  # [3, K]

    # Scaled offsets per dimension: [N, K] = [N, 1] - [1, K] broadcasts.
    scaled0 = (pts[:, 0:1] - mu[0:1, :]) * inv_sigma[0:1, :]
    scaled1 = (pts[:, 1:2] - mu[1:2, :]) * inv_sigma[1:2, :]
    scaled2 = (pts[:, 2:3] - mu[2:3, :]) * inv_sigma[2:3, :]

    dist2 = scaled0 * scaled0 + scaled1 * scaled1 + scaled2 * scaled2  # [N,K]
    # Isotropic pdf coefficient (sigma_x ** D), parity with the
    # reference's manual formula (`tf_util.py:687`).
    sig0 = sigma[0:1, :]  # [1, K]
    coef = (1.0 / math.pow(2.0 * math.pi, d_dims / 2.0)) / (
        sig0 * sig0 * sig0
    )  # [1, K]
    p = coef * jnp.exp(-0.5 * dist2)  # [N, K]

    wp = p * w  # [N, K] (w broadcasts from [1, K])
    q = wp / jnp.sum(wp, axis=1, keepdims=True)

    # Padding mask: strict comparison preserved (row index == n_eff is
    # treated as real; reference `tf_util.py:696`).
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)
    real = rows <= n_eff
    q = jnp.where(real, q, 0.0)

    rsqrt_w = jax.lax.rsqrt(w)  # [1, K]
    d_pi_all = jnp.where(real, (q - w) * rsqrt_w, 0.0)

    eff = jnp.maximum(n_eff, 1).astype(jnp.float32)
    inv_eff = 1.0 / eff

    def signed_sqrt(x):
        return jnp.sign(x) * jnp.sqrt(jnp.abs(x))

    # ---- 20 channel rows, reduced over the point axis ----
    chans = [
        jnp.max(d_pi_all, axis=0),
        jnp.sum(d_pi_all, axis=0),
    ]
    for scaled_d in (scaled0, scaled1, scaled2):
        chans.append(jnp.max(q * scaled_d, axis=0))
    for scaled_d in (scaled0, scaled1, scaled2):
        chans.append(jnp.min(q * scaled_d, axis=0))
    for scaled_d in (scaled0, scaled1, scaled2):
        chans.append(jnp.sum(q * scaled_d, axis=0))
    for scaled_d in (scaled0, scaled1, scaled2):
        chans.append(jnp.max(q * (scaled_d * scaled_d - 1.0), axis=0))
    for scaled_d in (scaled0, scaled1, scaled2):
        chans.append(jnp.min(q * (scaled_d * scaled_d - 1.0), axis=0))
    for scaled_d in (scaled0, scaled1, scaled2):
        chans.append(jnp.sum(q * (scaled_d * scaled_d - 1.0), axis=0))

    stats = jnp.stack(chans, axis=0)  # [20, K] in kernel-local order:
    # rows 0-1: pi(max,sum); 2-4 mu_max xyz; 5-7 mu_min; 8-10 mu_sum;
    # 11-13 sig_max; 14-16 sig_min; 17-19 sig_sum — the reference layout.
    scale_rows = jnp.concatenate(
        [
            jnp.ones((2, k), jnp.float32),
            jnp.tile(jax.lax.rsqrt(w), (9, 1)),
            jnp.tile(jax.lax.rsqrt(2.0 * w), (9, 1)),
        ],
        axis=0,
    )
    stats = signed_sqrt(stats * scale_rows * inv_eff)

    # L2 normalization over the Gaussian axis, independently per channel
    # row (reference normalizes axis=1 of [B, K, C], `tf_util.py:738-741`).
    norms = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(stats * stats, axis=1, keepdims=True), _EPS)
    )
    out_ref[0] = stats * norms


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def tdmfv_n_est_pallas(points, w, mu, sigma, n_eff):
    """Fused 3DmFV statistics: [B, N, 3] -> [B, 20, K] (float32)."""
    return _forward(points, w, mu, sigma, n_eff)


def _forward(points, w, mu, sigma, n_eff):
    B, N, _ = points.shape
    K = mu.shape[0]
    pts_f = points.astype(jnp.float32)  # [B,N,3] — native layout, no transpose
    mu_t = jnp.transpose(mu.astype(jnp.float32))  # [3,K]
    sigma_t = jnp.transpose(sigma.astype(jnp.float32))  # [3,K]
    w_row = w.astype(jnp.float32)[None, :]  # [1,K]
    n_eff = n_eff.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, N, 3), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 20, K), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    flops_per_patch = N * K * 30
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, 20, K), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=B * flops_per_patch,
            bytes_accessed=B * (3 * N + 20 * K) * 4,
            transcendentals=B * N * K,
        ),
    )(n_eff, pts_f, mu_t, sigma_t, w_row)


def _fwd(points, w, mu, sigma, n_eff):
    out = _forward(points, w, mu, sigma, n_eff)
    return out, (points, w, mu, sigma, n_eff)


def _bwd(residuals, g):
    """Backward pass via autodiff of the jnp reference implementation
    (`ops.mups.tdmfv_n_est`) — numerically identical statistics, so the
    VJP is exact for the kernel too."""
    points, w, mu, sigma, n_eff = residuals

    def ref(points_):
        return tdmfv_n_est(points_, w, mu, sigma, n_eff, flatten=False)

    _, vjp = jax.vjp(ref, points)
    (d_points,) = vjp(g)
    return d_points, None, None, None, None


tdmfv_n_est_pallas.defvjp(_fwd, _bwd)
