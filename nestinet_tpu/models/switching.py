"""Noise-switching normal estimation (ablation model).

Parity target: `models/ms_sw_n_est.py` — two scales; a noise-estimation
CNN reads the LARGE-scale grid and predicts a scalar noise level (ReLU
output); two normal-estimation CNNs read the small/large grids; a hard
switch `noise < 0.015` picks the small-scale prediction for clean data
and the large-scale one for noisy data (`ms_sw_n_est.py:82-84`).
"""

from __future__ import annotations

import haiku as hk
import jax.numpy as jnp

from ..ops.nn import run_backbone
from . import backbones
from .base import ModelBase, fc_head
from .losses import switching_loss

NOISE_SWITCH_THRESHOLD = 0.015  # `ms_sw_n_est.py:82`


class SwitchingNormEst(ModelBase):
    def __init__(self, cfg, gmm):
        super().__init__(cfg, gmm)
        assert cfg.n_scales == 2, "switching model takes exactly two radii"

        def forward(points, n_eff, is_training, bn_momentum):
            grid = self._mups_grid(points, n_eff)  # [B,r,r,r,40]
            grid = grid.astype(self.compute_dtype)
            small = grid[..., :20]
            large = grid[..., 20:]

            def conv_feat(x, prefix):
                return run_backbone(
                    x, backbones.SW_BACKBONE, is_training, bn_momentum,
                    name_prefix=prefix,
                )

            noise_feat = conv_feat(large, "noise_")
            # The final layer's inputs are post-ReLU (all >= 0), so one
            # weight vector drives every sample's preactivation to the
            # same sign; with the reference's output ReLU + xavier/zero
            # init the head dies (grad exactly 0) the moment that sign
            # goes negative — and MSE against targets ~1e-2 pushes the
            # O(1)-scale xavier preactivations exactly there.  Start the
            # head at the switch threshold instead: tiny final weights +
            # bias = 0.015, so every sample's ReLU is alive and the
            # prediction already sits at the targets' scale.  Init-only
            # change; the architecture stays `ms_sw_n_est.py:138-173`.
            noise_est = fc_head(
                noise_feat, (1024, 256, 128), 1,
                is_training=is_training, bn_momentum=bn_momentum,
                final_w_init=hk.initializers.TruncatedNormal(stddev=1e-3),
                final_b_init=hk.initializers.Constant(NOISE_SWITCH_THRESHOLD),
                name="noise_fc",
            )
            # ReLU output activation (`ms_sw_n_est.py:169`), squeezed to [B].
            noise_est = jnp.maximum(noise_est, 0.0)[:, 0]

            n_large = fc_head(
                conv_feat(large, "large_"), (1024, 256, 128), 3,
                is_training=is_training, bn_momentum=bn_momentum, name="large_fc",
            )
            n_small = fc_head(
                conv_feat(small, "small_"), (1024, 256, 128), 3,
                is_training=is_training, bn_momentum=bn_momentum, name="small_fc",
            )

            mask = (noise_est < NOISE_SWITCH_THRESHOLD)[:, None]
            n_est = jnp.where(mask, n_small, n_large)
            return noise_est.astype(jnp.float32), n_est.astype(jnp.float32)

        self._fwd = hk.transform_with_state(forward)

    def init(self, rng, batch):
        return self._fwd.init(
            rng, batch["points"], batch["n_eff"], True, self.cfg.bn_init_decay
        )

    def apply(self, params, state, rng, batch, is_training, bn_momentum):
        with self.quant_ctx(is_training):
            (noise_est, n_est), new_state = self._fwd.apply(
                params, state, rng, batch["points"], batch["n_eff"],
                is_training, bn_momentum,
            )
        return {"n_pred": n_est, "noise_pred": noise_est}, new_state

    def loss(self, outputs, batch):
        loss, cos_ang, noise_loss = switching_loss(
            outputs["noise_pred"], batch["noise"],
            outputs["n_pred"], batch["normals"], self.cfg.loss_type,
        )
        return loss, {"cos_ang": cos_ang, "noise_loss": noise_loss}

    def predict_normals(self, outputs):
        return outputs["n_pred"]
