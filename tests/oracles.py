"""Literal numpy oracles for kernel parity tests.

These mirror the reference TF graphs operation-by-operation (tile-based,
no vectorization tricks) so that the optimized JAX/Pallas kernels in
`nestinet_tpu.ops` can be validated against an independent second
implementation of the same math.  Mirrors:
  * `tdmfv_n_est_oracle`  ~ reference `utils/tf_util.py:655-753`
  * `tdmfv_cls_oracle`    ~ reference `utils/tf_util.py:578-652`
"""

import numpy as np


def _l2_normalize(x, axis, eps=1e-12):
    sq = np.sum(np.square(x), axis=axis, keepdims=True)
    return x / np.sqrt(np.maximum(sq, eps))


def tdmfv_n_est_oracle(points, w, mu, sigma, n_eff=None, flatten=True):
    """Tile-based mirror of the padding-compensated 3DmFV kernel."""
    points = np.asarray(points, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    mu = np.asarray(mu, dtype=np.float64)
    sigma = np.asarray(sigma, dtype=np.float64)
    B, N, D = points.shape
    K = mu.shape[0]

    batch_sig = np.tile(sigma[None, None], [B, N, 1, 1])  # [B,N,K,D]
    batch_mu = np.tile(mu[None, None], [B, N, 1, 1])
    batch_w = np.tile(w[None, None], [B, N, 1])  # [B,N,K]
    batch_points = np.tile(points[:, :, None, :], [1, 1, K, 1])

    w_per_batch_per_d = np.tile(w[None, :, None], [B, 1, 3 * D])  # [B,K,9]

    p_per_point = (
        1.0 / (np.power(2.0 * np.pi, D / 2.0) * np.power(batch_sig[:, :, :, 0], D))
    ) * np.exp(-0.5 * np.sum(np.square((batch_points - batch_mu) / batch_sig), axis=3))
    zeros = np.zeros_like(p_per_point)

    if n_eff is not None:
        r = np.tile(np.arange(N)[None, :, None], (B, 1, K))
        idxs = np.tile(np.asarray(n_eff, dtype=np.int64)[:, None, None], (1, N, K))
        mask = r > idxs
    else:
        mask = np.zeros_like(p_per_point, dtype=bool)

    w_zero_compensate = np.where(mask, batch_w, zeros)

    w_p = p_per_point * batch_w
    q = w_p / np.tile(np.sum(w_p, axis=-1, keepdims=True), [1, 1, K])
    q = np.where(mask, zeros, q)
    q_per_d = np.tile(q[..., None], [1, 1, 1, D])

    d_pi_all = ((q - batch_w + w_zero_compensate) / np.sqrt(batch_w))[..., None]
    d_pi = np.concatenate([np.max(d_pi_all, axis=1), np.sum(d_pi_all, axis=1)], axis=2)

    d_mu_all = q_per_d * (batch_points - batch_mu) / batch_sig
    d_mu = (1.0 / np.sqrt(w_per_batch_per_d)) * np.concatenate(
        [np.max(d_mu_all, axis=1), np.min(d_mu_all, axis=1), np.sum(d_mu_all, axis=1)],
        axis=2,
    )

    d_sig_all = q_per_d * (np.square((batch_points - batch_mu) / batch_sig) - 1.0)
    d_sigma = (1.0 / np.sqrt(2.0 * w_per_batch_per_d)) * np.concatenate(
        [np.max(d_sig_all, axis=1), np.min(d_sig_all, axis=1), np.sum(d_sig_all, axis=1)],
        axis=2,
    )

    if n_eff is not None:
        effective_n = np.maximum(np.asarray(n_eff, dtype=np.float64), 1.0)[:, None, None]
    else:
        effective_n = float(N)

    d_pi = d_pi / effective_n
    d_mu = d_mu / effective_n
    d_sigma = d_sigma / effective_n

    alpha = 0.5
    d_pi = np.sign(d_pi) * np.power(np.abs(d_pi), alpha)
    d_mu = np.sign(d_mu) * np.power(np.abs(d_mu), alpha)
    d_sigma = np.sign(d_sigma) * np.power(np.abs(d_sigma), alpha)

    d_pi = _l2_normalize(d_pi, axis=1)
    d_mu = _l2_normalize(d_mu, axis=1)
    d_sigma = _l2_normalize(d_sigma, axis=1)

    if flatten:
        d_pi = np.transpose(d_pi, (0, 2, 1)).reshape(B, -1)
        d_mu = np.transpose(d_mu, (0, 2, 1)).reshape(B, -1)
        d_sigma = np.transpose(d_sigma, (0, 2, 1)).reshape(B, -1)
        return np.concatenate([d_pi, d_mu, d_sigma], axis=1)
    fv = np.concatenate([d_pi, d_mu, d_sigma], axis=2)
    return np.transpose(fv, (0, 2, 1))


def tdmfv_cls_oracle(points, w, mu, sigma, flatten=True):
    """Tile-based mirror of the classification-flavored 3DmFV kernel."""
    points = np.asarray(points, dtype=np.float64)
    w = np.asarray(w, dtype=np.float64)
    mu = np.asarray(mu, dtype=np.float64)
    sigma = np.asarray(sigma, dtype=np.float64)
    B, N, D = points.shape
    K = mu.shape[0]

    batch_sig = np.tile(sigma[None, None], [B, N, 1, 1])
    batch_mu = np.tile(mu[None, None], [B, N, 1, 1])
    batch_w = np.tile(w[None, None], [B, N, 1])
    batch_points = np.tile(points[:, :, None, :], [1, 1, K, 1])
    w_per_batch_per_d = np.tile(w[None, :, None], [B, 1, 3 * D])

    # Diagonal multivariate normal pdf (the reference used tf.contrib's
    # MultivariateNormalDiag here).
    p_per_point = np.exp(
        -0.5 * np.sum(np.square((batch_points - batch_mu) / batch_sig), axis=3)
    ) / (np.power(2.0 * np.pi, D / 2.0) * np.prod(batch_sig, axis=3))

    w_p = p_per_point * batch_w
    q = w_p / np.sum(w_p, axis=-1, keepdims=True)
    q_per_d = np.tile(q[..., None], [1, 1, 1, D])

    d_pi_all = ((q - batch_w) / (np.sqrt(batch_w) * N))[..., None]
    d_pi = np.concatenate([np.max(d_pi_all, axis=1), np.sum(d_pi_all, axis=1)], axis=2)

    d_mu_all = q_per_d * (batch_points - batch_mu) / batch_sig
    d_mu = (1.0 / (N * np.sqrt(w_per_batch_per_d))) * np.concatenate(
        [np.max(d_mu_all, axis=1), np.min(d_mu_all, axis=1), np.sum(d_mu_all, axis=1)],
        axis=2,
    )

    d_sig_all = q_per_d * (np.square((batch_points - batch_mu) / batch_sig) - 1.0)
    d_sigma = (1.0 / (N * np.sqrt(2.0 * w_per_batch_per_d))) * np.concatenate(
        [np.max(d_sig_all, axis=1), np.min(d_sig_all, axis=1), np.sum(d_sig_all, axis=1)],
        axis=2,
    )

    alpha = 0.5
    d_pi = np.sign(d_pi) * np.power(np.abs(d_pi), alpha)
    d_mu = np.sign(d_mu) * np.power(np.abs(d_mu), alpha)
    d_sigma = np.sign(d_sigma) * np.power(np.abs(d_sigma), alpha)

    d_pi = _l2_normalize(d_pi, axis=1)
    d_mu = _l2_normalize(d_mu, axis=1)
    d_sigma = _l2_normalize(d_sigma, axis=1)

    if flatten:
        d_pi = np.transpose(d_pi, (0, 2, 1)).reshape(B, -1)
        d_mu = np.transpose(d_mu, (0, 2, 1)).reshape(B, -1)
        d_sigma = np.transpose(d_sigma, (0, 2, 1)).reshape(B, -1)
        return np.concatenate([d_pi, d_mu, d_sigma], axis=1)
    fv = np.concatenate([d_pi, d_mu, d_sigma], axis=2)
    return np.transpose(fv, (0, 2, 1))
