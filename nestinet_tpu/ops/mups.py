"""3D modified Fisher Vector (3DmFV) point statistics and the multi-scale
stack (MuPS), as pure JAX functions.

Capability parity with the reference TF kernels:
  * `tdmfv_n_est`          ~ `utils/tf_util.py:655-753` (`get_3dmfv_n_est`),
    the load-bearing normal-estimation kernel with zero-padding
    compensation.  All semantic quirks are preserved and documented:
      - the padding mask is strict (`row > n_eff`), i.e. the row whose
        index equals `n_eff` is treated as real (reference off-by-one,
        `tf_util.py:696`);
      - masked rows contribute exact zeros to the max/min/sum reductions
        (because soft-assignments are zeroed, `tf_util.py:703`, and the
        d_pi weight-compensation term cancels `-w`, `tf_util.py:698,710`);
      - per-derivative tensors are divided by the *effective* point count
        BEFORE the signed-sqrt power normalization and the L2
        normalization over the Gaussian axis (`tf_util.py:722-741`).
    One deliberate fix-not-copy: `n_eff == 0` rows (zero-padded tail
    batches at inference) divide by 1 instead of 0 so they produce finite
    garbage instead of NaNs; the reference produced NaNs that were
    discarded downstream.
  * `tdmfv_classification`  ~ `utils/tf_util.py:578-652` (`get_3dmfv`),
    the classification-flavored variant (no padding compensation, static-N
    normalization folded into the derivative formulas).
  * `mups`                  ~ the per-scale loop in
    `models/experts_n_est.py:66-76`: per-radius 3DmFV grids concatenated
    on the channel axis -> [B, res, res, res, 20 * n_scales].

Design notes (TPU): everything is trace-friendly (static shapes, no
Python control flow on traced values).  The [B, N, K, D] intermediates
are expressed as broadcast-then-reduce so XLA fuses them without
materializing in HBM; `ops/pallas/mups_kernel.py` provides a hand-fused
Pallas kernel for the hot path that blocks over N with the 20-channel
moment accumulators resident in VMEM.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Number of statistics channels per Gaussian:
#   d_pi: max, sum (2) | d_mu: max/min/sum x 3 dims (9) | d_sigma: same (9)
N_CHANNELS = 20


def _l2_normalize(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    """tf.nn.l2_normalize semantics: x * rsqrt(max(sum(x^2), eps))."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))


def _signed_sqrt(x: jnp.ndarray, alpha: float = 0.5) -> jnp.ndarray:
    return jnp.sign(x) * jnp.power(jnp.abs(x), alpha)


def tdmfv_n_est(
    points: jnp.ndarray,
    w: jnp.ndarray,
    mu: jnp.ndarray,
    sigma: jnp.ndarray,
    n_eff: jnp.ndarray | None = None,
    *,
    flatten: bool = True,
) -> jnp.ndarray:
    """3DmFV statistics with zero-padding compensation.

    Args:
        points: [B, N, D] patch points (zero-padded to N).
        w:      [K] Gaussian weights.
        mu:     [K, D] Gaussian means.
        sigma:  [K, D] Gaussian standard deviations (the pdf coefficient
                uses sigma[:, 0] with an isotropic assumption, as in the
                reference at `tf_util.py:687`).
        n_eff:  [B] effective (un-padded) point count per patch, or None
                for fully dense patches.
        flatten: if True return [B, 20*K] (channel-major, each channel
                contiguous over K); else [B, 20, K].

    Returns:
        The 20-channel statistics grid, power- and L2-normalized.
    """
    B, N, D = points.shape
    K = mu.shape[0]
    w = w.astype(points.dtype)
    mu = mu.astype(points.dtype)
    sigma = sigma.astype(points.dtype)

    # Per-point, per-Gaussian scaled offsets (fused by XLA into the reductions).
    scaled = (points[:, :, None, :] - mu[None, None]) / sigma[None, None]  # [B,N,K,D]
    dist2 = jnp.sum(jnp.square(scaled), axis=-1)  # [B,N,K]
    coef = 1.0 / (math.pow(2.0 * math.pi, D / 2.0) * jnp.power(sigma[:, 0], D))  # [K]
    p = coef[None, None] * jnp.exp(-0.5 * dist2)  # [B,N,K]

    wp = p * w[None, None]
    q = wp / jnp.sum(wp, axis=-1, keepdims=True)  # soft assignment [B,N,K]

    if n_eff is not None:
        n_eff = n_eff.astype(jnp.int32)
        row = jnp.arange(N, dtype=jnp.int32)[None, :]  # [1,N]
        # Strict comparison preserved: the row at index == n_eff counts as
        # real (reference `tf_util.py:696`).
        real = (row <= n_eff[:, None])[:, :, None]  # [B,N,1]
        q = jnp.where(real, q, 0.0)
        d_pi_all = jnp.where(real, (q - w[None, None]) * jax.lax.rsqrt(w)[None, None], 0.0)
        eff = jnp.maximum(n_eff, 1).astype(points.dtype)[:, None, None]  # [B,1,1]
    else:
        d_pi_all = (q - w[None, None]) * jax.lax.rsqrt(w)[None, None]
        eff = jnp.asarray(float(N), dtype=points.dtype)

    # d_pi: [B, K, 2] = (max, sum) over the point axis.
    d_pi = jnp.stack(
        [jnp.max(d_pi_all, axis=1), jnp.sum(d_pi_all, axis=1)], axis=-1
    )

    q4 = q[..., None]  # [B,N,K,1]
    d_mu_all = q4 * scaled  # [B,N,K,D]
    d_mu = jnp.concatenate(
        [
            jnp.max(d_mu_all, axis=1),
            jnp.min(d_mu_all, axis=1),
            jnp.sum(d_mu_all, axis=1),
        ],
        axis=-1,
    ) * jax.lax.rsqrt(w)[None, :, None]  # [B,K,9]

    d_sig_all = q4 * (jnp.square(scaled) - 1.0)
    d_sigma = jnp.concatenate(
        [
            jnp.max(d_sig_all, axis=1),
            jnp.min(d_sig_all, axis=1),
            jnp.sum(d_sig_all, axis=1),
        ],
        axis=-1,
    ) * jax.lax.rsqrt(2.0 * w)[None, :, None]  # [B,K,9]

    # Normalize by the effective point count, THEN power + L2 normalize
    # (order matters for parity; reference `tf_util.py:722-741`).
    d_pi = _signed_sqrt(d_pi / eff)
    d_mu = _signed_sqrt(d_mu / eff)
    d_sigma = _signed_sqrt(d_sigma / eff)

    # L2 normalization is over the Gaussian axis, per feature channel.
    d_pi = _l2_normalize(d_pi, axis=1)
    d_mu = _l2_normalize(d_mu, axis=1)
    d_sigma = _l2_normalize(d_sigma, axis=1)

    fv = jnp.concatenate([d_pi, d_mu, d_sigma], axis=-1)  # [B,K,20]
    fv = jnp.transpose(fv, (0, 2, 1))  # [B,20,K] channel-major
    if flatten:
        return fv.reshape(B, N_CHANNELS * K)
    return fv


@partial(jax.jit, static_argnames=("n_scales", "resolution", "impl"))
def mups(
    points: jnp.ndarray,
    n_eff: jnp.ndarray,
    w: jnp.ndarray,
    mu: jnp.ndarray,
    sigma: jnp.ndarray,
    *,
    n_scales: int,
    resolution: int,
    impl: str = "jnp",
) -> jnp.ndarray:
    """Multi-scale point statistics (MuPS) grid.

    Args:
        points: [B, n_scales * N, 3] concatenated per-scale patches.
        n_eff:  [B, n_scales] effective point counts.
        impl:   "jnp" (broadcast+reduce, XLA-fused) or "pallas" (the
                fused VMEM-resident TPU kernel in ops/pallas/).
    Returns:
        [B, res, res, res, 20 * n_scales]; channel c of scale s lands at
        index s * 20 + c, matching the reference channel-concat
        (`experts_n_est.py:71-76`).
    """
    B, total, D = points.shape
    N = total // n_scales
    K = resolution ** 3
    pts = points.reshape(B, n_scales, N, D)
    if impl == "pallas":
        from .pallas.mups_kernel import tdmfv_n_est_pallas

        # One kernel launch over the merged (batch, scale) grid: the
        # per-patch program is identical across scales, so B*n_scales
        # programs beats vmap-of-pallas_call both in compile time and
        # in scheduling freedom.
        flat = tdmfv_n_est_pallas(
            pts.reshape(B * n_scales, N, D),
            w,
            mu,
            sigma,
            n_eff.reshape(B * n_scales),
        )  # [B*n_scales, 20, K]
        fv = flat.reshape(B, n_scales, N_CHANNELS, K)
    else:
        fv = jax.vmap(
            lambda p, ne: tdmfv_n_est(p, w, mu, sigma, ne, flatten=False),
            in_axes=(1, 1),
            out_axes=1,
        )(pts, n_eff)  # [B, n_scales, 20, K]
    # [B, n_scales, 20, K] -> [B, K, n_scales, 20] -> grid
    fv = jnp.transpose(fv, (0, 3, 1, 2)).reshape(
        B, resolution, resolution, resolution, n_scales * N_CHANNELS
    )
    return fv


def tdmfv_classification(
    points: jnp.ndarray,
    w: jnp.ndarray,
    mu: jnp.ndarray,
    sigma: jnp.ndarray,
    *,
    flatten: bool = True,
) -> jnp.ndarray:
    """Classification-flavored 3DmFV (parity: `tf_util.py:578-652`).

    Differences from `tdmfv_n_est`: no padding compensation; the static
    point count is folded into the derivative formulas BEFORE the
    max/min/sum reductions; no post-hoc count normalization.
    """
    B, N, D = points.shape
    K = mu.shape[0]
    w = w.astype(points.dtype)
    mu = mu.astype(points.dtype)
    sigma = sigma.astype(points.dtype)

    scaled = (points[:, :, None, :] - mu[None, None]) / sigma[None, None]
    dist2 = jnp.sum(jnp.square(scaled), axis=-1)
    # The reference uses a true multivariate-normal pdf here (per-axis
    # sigmas); with the grid GMM's isotropic sigma this is identical to
    # the manual formula in tdmfv_n_est.
    coef = 1.0 / (
        math.pow(2.0 * math.pi, D / 2.0) * jnp.prod(sigma, axis=-1)
    )
    p = coef[None, None] * jnp.exp(-0.5 * dist2)

    wp = p * w[None, None]
    q = wp / jnp.sum(wp, axis=-1, keepdims=True)

    d_pi_all = (q - w[None, None]) / (jnp.sqrt(w)[None, None] * N)
    d_pi = jnp.stack([jnp.max(d_pi_all, axis=1), jnp.sum(d_pi_all, axis=1)], axis=-1)

    q4 = q[..., None]
    d_mu_all = q4 * scaled
    d_mu = jnp.concatenate(
        [jnp.max(d_mu_all, axis=1), jnp.min(d_mu_all, axis=1), jnp.sum(d_mu_all, axis=1)],
        axis=-1,
    ) / (N * jnp.sqrt(w)[None, :, None])

    d_sig_all = q4 * (jnp.square(scaled) - 1.0)
    d_sigma = jnp.concatenate(
        [jnp.max(d_sig_all, axis=1), jnp.min(d_sig_all, axis=1), jnp.sum(d_sig_all, axis=1)],
        axis=-1,
    ) / (N * jnp.sqrt(2.0 * w)[None, :, None])

    d_pi = _l2_normalize(_signed_sqrt(d_pi), axis=1)
    d_mu = _l2_normalize(_signed_sqrt(d_mu), axis=1)
    d_sigma = _l2_normalize(_signed_sqrt(d_sigma), axis=1)

    fv = jnp.concatenate([d_pi, d_mu, d_sigma], axis=-1)
    fv = jnp.transpose(fv, (0, 2, 1))
    if flatten:
        return fv.reshape(B, N_CHANNELS * K)
    return fv


def _finalize(d_pi, d_mu, d_sigma, *, flatten: bool, normalize: bool = True):
    """Shared tail: signed-sqrt, per-channel L2 over Gaussians, layout."""
    if normalize:
        d_pi = _l2_normalize(_signed_sqrt(d_pi), axis=1)
        d_mu = _l2_normalize(_signed_sqrt(d_mu), axis=1)
        d_sigma = _l2_normalize(_signed_sqrt(d_sigma), axis=1)
    fv = jnp.concatenate([d_pi, d_mu, d_sigma], axis=-1)
    fv = jnp.transpose(fv, (0, 2, 1))
    if flatten:
        return fv.reshape(fv.shape[0], -1)
    return fv


def _soft_assign(points, w, mu, sigma):
    """(scaled offsets [B,N,K,D], soft assignment Q [B,N,K])."""
    scaled = (points[:, :, None, :] - mu[None, None]) / sigma[None, None]
    dist2 = jnp.sum(jnp.square(scaled), axis=-1)
    coef = 1.0 / (
        math.pow(2.0 * math.pi, mu.shape[1] / 2.0) * jnp.prod(sigma, axis=-1)
    )
    p = coef[None, None] * jnp.exp(-0.5 * dist2)
    wp = p * w[None, None]
    q = wp / jnp.sum(wp, axis=-1, keepdims=True)
    return scaled, q


def tdmfv_sym(points, w, mu, sigma, *, sym_type: str = "max", flatten: bool = True):
    """3DmFV with a single symmetric aggregation ('max'|'min'|'ss') —
    7 channels per Gaussian (parity: `tf_util.py:756-836`).  Library
    function carried over from 3DmFV-Net; not used by the normal
    estimation path."""
    B, N, D = points.shape
    w = w.astype(points.dtype)
    mu = mu.astype(points.dtype)
    sigma = sigma.astype(points.dtype)
    scaled, q = _soft_assign(points, w, mu, sigma)
    q4 = q[..., None]

    d_pi_all = ((q - w[None, None]) / (jnp.sqrt(w)[None, None] * N))[..., None]
    d_mu_all = q4 * scaled
    d_sig_all = q4 * (jnp.square(scaled) - 1.0)

    mu_scale = 1.0 / (N * jnp.sqrt(w))[None, :, None]
    sig_scale = 1.0 / (N * jnp.sqrt(2.0 * w))[None, :, None]
    if sym_type == "max":
        agg = lambda x: jnp.max(x, axis=1)  # noqa: E731
    elif sym_type == "min":
        agg = lambda x: jnp.min(x, axis=1)  # noqa: E731
    elif sym_type == "ss":
        agg = lambda x: jnp.sum(jnp.square(x), axis=1)  # noqa: E731
    else:
        raise ValueError(f"unknown sym_type: {sym_type}")
    d_pi = agg(d_pi_all)
    d_mu = mu_scale * agg(d_mu_all)
    d_sigma = sig_scale * agg(d_sig_all)
    return _finalize(d_pi, d_mu, d_sigma, flatten=flatten)


def fv(points, w, mu, sigma, *, flatten: bool = True, normalize: bool = True):
    """Plain (sum-aggregated) Fisher vector — 7 channels per Gaussian
    (parity: `tf_util.py:839-993`, the mvn and no-mvn variants share
    this math for diagonal GMMs)."""
    B, N, D = points.shape
    w = w.astype(points.dtype)
    mu = mu.astype(points.dtype)
    sigma = sigma.astype(points.dtype)
    scaled, q = _soft_assign(points, w, mu, sigma)
    q4 = q[..., None]

    d_pi = jnp.sum((q - w[None, None]) / jnp.sqrt(w)[None, None], axis=1)[..., None]
    d_mu = jnp.sum(q4 * scaled, axis=1) / jnp.sqrt(w)[None, :, None]
    d_sigma = (
        jnp.sum(q4 * (jnp.square(scaled) - 1.0), axis=1)
        / jnp.sqrt(2.0 * w)[None, :, None]
    )
    d_pi, d_mu, d_sigma = d_pi / N, d_mu / N, d_sigma / N
    return _finalize(d_pi, d_mu, d_sigma, flatten=flatten, normalize=normalize)


def tdmfv_seg(points, w, mu, sigma, *, flatten: bool = True):
    """Segmentation-flavored 3DmFV: the 20-channel global statistics plus
    unaggregated per-point 7-channel features (parity:
    `tf_util.py:996-1080`).  Returns (fv, fv_per_point [B, N, 7*K])."""
    B, N, D = points.shape
    w = w.astype(points.dtype)
    mu = mu.astype(points.dtype)
    sigma = sigma.astype(points.dtype)
    scaled, q = _soft_assign(points, w, mu, sigma)
    q4 = q[..., None]
    inv_n = 1.0 / N

    d_pi_all = (inv_n * (q - w[None, None]) / jnp.sqrt(w)[None, None])[..., None]
    d_mu_all = q4 * scaled
    d_sig_all = q4 * (jnp.square(scaled) - 1.0)

    d_pi = jnp.concatenate(
        [jnp.max(d_pi_all, axis=1), jnp.sum(d_pi_all, axis=1)], axis=-1
    )
    d_mu = inv_n / jnp.sqrt(w)[None, :, None] * jnp.concatenate(
        [jnp.max(d_mu_all, axis=1), jnp.min(d_mu_all, axis=1), jnp.sum(d_mu_all, axis=1)],
        axis=-1,
    )
    d_sigma = inv_n / jnp.sqrt(2.0 * w)[None, :, None] * jnp.concatenate(
        [jnp.max(d_sig_all, axis=1), jnp.min(d_sig_all, axis=1), jnp.sum(d_sig_all, axis=1)],
        axis=-1,
    )
    out = _finalize(d_pi, d_mu, d_sigma, flatten=flatten)
    fv_per_point = jnp.concatenate([d_pi_all, d_mu_all, d_sig_all], axis=3)
    fv_per_point = fv_per_point.reshape(B, N, -1)
    return out, fv_per_point


# ---------------------------------------------------------------------------
# numpy reference implementations (library functions; parity with the
# reference's host-side oracles `utils/utils.py:147-330`).
# ---------------------------------------------------------------------------


def soft_assignment_np(points: np.ndarray, gmm) -> np.ndarray:
    """Posterior responsibilities q[n, k] of each point under a diagonal
    GMM (numpy, host-side; used by viz and the learned-GMM path)."""
    points = np.atleast_2d(points)
    weights, means, covariances = gmm.weights, gmm.means, gmm.covariances
    diff = points[:, None, :] - means[None]  # [N,K,D]
    log_p = -0.5 * np.sum(diff ** 2 / covariances[None], axis=-1)
    log_p += -0.5 * np.sum(np.log(2.0 * np.pi * covariances), axis=-1)[None]
    log_wp = log_p + np.log(weights)[None]
    log_wp -= log_wp.max(axis=1, keepdims=True)
    q = np.exp(log_wp)
    q /= q.sum(axis=1, keepdims=True)
    return q


def fisher_vector_np(xx: np.ndarray, gmm, normalization: bool = True) -> np.ndarray:
    """Classic (sum-aggregated) Fisher vector of a point set.

    Parity: `utils/utils.py:147-211` (the Sanchez et al. formulation with
    signed-sqrt power normalization and per-column L2 normalization).
    `gmm` is a GridGMM.
    """
    xx = np.atleast_2d(xx)
    n_points = xx.shape[0]
    weights, means, covariances = gmm.weights, gmm.means, gmm.covariances
    D = means.shape[1]

    # Posterior responsibilities under the diagonal GMM.
    diff = xx[:, None, :] - means[None]  # [N,K,D]
    log_p = -0.5 * np.sum(diff ** 2 / covariances[None], axis=-1)
    log_p += -0.5 * np.sum(np.log(2.0 * np.pi * covariances), axis=-1)[None]
    log_wp = log_p + np.log(weights)[None]
    log_wp -= log_wp.max(axis=1, keepdims=True)
    q = np.exp(log_wp)
    q /= q.sum(axis=1, keepdims=True)  # [N,K]

    s0 = q.sum(0)[:, None] / n_points
    s1 = q.T @ xx / n_points
    s2 = q.T @ (xx ** 2) / n_points

    tiled_w = np.tile(weights[:, None], [1, D])
    d_pi = (s0.squeeze() - n_points * weights) / np.sqrt(weights)
    d_mu = (s1 - means * s0) / np.sqrt(tiled_w * covariances)
    d_sigma = (s2 - 2 * s1 * means + s0 * means ** 2 - s0 * covariances) / (
        np.sqrt(2 * tiled_w) * covariances
    )

    alpha = 0.5
    d_pi = np.sign(d_pi) * np.abs(d_pi) ** alpha
    d_mu = np.sign(d_mu) * np.abs(d_mu) ** alpha
    d_sigma = np.sign(d_sigma) * np.abs(d_sigma) ** alpha

    if normalization:
        def _norm_cols(a):
            a = np.atleast_2d(a.T).T if a.ndim == 1 else a
            n = np.linalg.norm(a, axis=0, keepdims=True)
            n = np.where(n == 0, 1.0, n)
            return a / n

        d_pi = _norm_cols(d_pi[:, None]).ravel()
        d_mu = _norm_cols(d_mu)
        d_sigma = _norm_cols(d_sigma)

    return np.hstack((d_pi, d_mu.flatten(), d_sigma.flatten()))


def fisher_vector_per_point_np(xx: np.ndarray, gmm):
    """Per-point (un-aggregated) Fisher-vector derivatives.

    Parity: `utils/utils.py:214-245` — returns the tuple
    (d_pi [N, K], d_mu [N, K, D], d_sigma [N, K, D]) BEFORE any point
    aggregation, used by the derivative visualizations
    (`viz/fv.py::visualize_derivatives`)."""
    xx = np.atleast_2d(xx)
    weights, means, covariances = gmm.weights, gmm.means, gmm.covariances

    q = soft_assignment_np(xx, gmm)  # [N, K]
    d_pi = (q - weights[None]) / np.sqrt(weights)[None]
    x_mu = xx[:, None, :] - means[None]  # [N, K, D]
    sqrt_w = np.sqrt(weights)[None, :, None]
    d_mu = q[..., None] * x_mu / (np.sqrt(covariances)[None] * sqrt_w)
    d_sigma = (
        q[..., None]
        * (np.square(x_mu) / covariances[None] - 1.0)
        / (np.sqrt(2.0) * sqrt_w)
    )
    return d_pi, d_mu, d_sigma
