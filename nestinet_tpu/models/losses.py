"""Angular loss functions for unoriented normal estimation.

Parity with the reference loss family (`models/ss_norm_est.py:115-142`,
`models/experts_n_est.py:111-152`):
  * 'cos':       1 - |cos| with a quadratic bowl below 0.01 (huber-like);
  * 'euclidean': min(||gt - pred||^2, ||gt + pred||^2) (sign-flip invariant);
  * 'sin':       2 * ||pred x gt|| (the flagship's default).
Mixture-of-experts aggregation (`experts_n_est.py:141-150`):
  * 'simple':   sum_i prob_i * diff_i, averaged over the batch;
  * 'gaussian': -log sum_i prob_i * N(diff_i), averaged over the batch.

All functions normalize inputs with an epsilon-guarded norm — the
reference divides by the raw norm and can NaN on a zero prediction; we
keep the gradient finite instead (documented fix-not-copy).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_EPS = 1e-12


def safe_normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axis, keepdims=True) + _EPS)
    return v / norm


def angular_diff(n_pred: jnp.ndarray, n_gt: jnp.ndarray, loss_type: str) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample angular difference on the trailing xyz axis.

    Returns (diff, cos_ang); leading axes are preserved (works for both
    [B, 3] and [E, B, 3] expert stacks).
    """
    n_pred = safe_normalize(n_pred)
    n_gt = safe_normalize(n_gt)
    cos_ang = jnp.sum(n_pred * n_gt, axis=-1)
    if loss_type == "cos":
        one_minus_cos = 1.0 - jnp.abs(cos_ang)
        diff = jnp.where(one_minus_cos > 0.01, one_minus_cos, 100.0 * one_minus_cos ** 2)
    elif loss_type == "euclidean":
        diff = jnp.minimum(
            jnp.sum(jnp.square(n_gt - n_pred), axis=-1),
            jnp.sum(jnp.square(n_gt + n_pred), axis=-1),
        )
    elif loss_type == "sin":
        cross = jnp.cross(n_pred, n_gt)
        diff = 2.0 * jnp.sqrt(jnp.sum(jnp.square(cross), axis=-1) + _EPS)
    else:
        raise ValueError(f"unknown loss type: {loss_type}")
    return diff, cos_ang


def normal_loss(n_pred: jnp.ndarray, n_gt: jnp.ndarray, loss_type: str = "cos"):
    """Single-prediction loss (ss / ms / switching models)."""
    diff, cos_ang = angular_diff(n_pred, n_gt, loss_type)
    return jnp.mean(diff), cos_ang


def moe_loss(
    n_pred: jnp.ndarray,
    n_gt: jnp.ndarray,
    experts_prob: jnp.ndarray,
    loss_type: str = "sin",
    expert_type: str = "simple",
):
    """Mixture-of-experts loss.

    Args:
        n_pred: [E, B, 3] per-expert predictions.
        n_gt: [B, 3] ground truth.
        experts_prob: [E, B] manager probabilities.
    Returns:
        (scalar loss, cos_ang [E, B]).
    """
    diff, cos_ang = angular_diff(n_pred, n_gt[None], loss_type)  # [E, B]
    if expert_type == "simple":
        loss = jnp.mean(jnp.sum(experts_prob * diff, axis=0))
    elif expert_type == "gaussian":
        lik = (1.0 / (2.0 * math.pi)) * jnp.exp(-0.5 * jnp.square(diff))
        loss = jnp.mean(-jnp.log(jnp.sum(experts_prob * lik, axis=0) + _EPS))
    else:
        raise ValueError(f"unknown expert loss type: {expert_type}")
    return loss, cos_ang


def switching_loss(noise_pred, noise_gt, n_pred, n_gt, loss_type: str = "cos"):
    """Noise MSE + angular loss (parity: `ms_sw_n_est.py:93-135`)."""
    noise_loss = jnp.mean(jnp.square(noise_pred - noise_gt))
    angle_loss, cos_ang = normal_loss(n_pred, n_gt, loss_type)
    return noise_loss + angle_loss, cos_ang, noise_loss
