"""Multi-scale normal estimation (ablation model).

Parity target: `models/ms_norm_est.py` — per-radius 3DmFV grids
concatenated on the channel axis, one shared CNN (separate specs for 8^3
and 3^3 grids), FC 1024/256/128 head with dropout.
"""

from __future__ import annotations

import haiku as hk
import jax.numpy as jnp

from ..ops.nn import run_backbone
from . import backbones
from .base import ModelBase, fc_head
from .losses import normal_loss


class MSNormEst(ModelBase):
    def __init__(self, cfg, gmm):
        super().__init__(cfg, gmm)
        if self.resolution == 8:
            spec = backbones.MS_BACKBONE_8G
        elif self.resolution == 3:
            spec = backbones.CONV_NET_3G
        else:
            raise ValueError(
                "ms model supports 3^3 or 8^3 Gaussian grids "
                "(parity: ms_norm_est.py:83-118)"
            )

        def forward(points, n_eff, is_training, bn_momentum):
            grid = self._mups_grid(points, n_eff)  # [B,r,r,r,20*S]
            grid = grid.astype(self.compute_dtype)
            feat = run_backbone(grid, spec, is_training, bn_momentum)
            n_est = fc_head(
                feat,
                (1024, 256, 128),
                3,
                is_training=is_training,
                bn_momentum=bn_momentum,
                dropout_rate=0.3,
            )
            return n_est.astype(jnp.float32)

        self._fwd = hk.transform_with_state(forward)

    def init(self, rng, batch):
        return self._fwd.init(
            rng, batch["points"], batch["n_eff"], True, self.cfg.bn_init_decay
        )

    def apply(self, params, state, rng, batch, is_training, bn_momentum):
        with self.quant_ctx(is_training):
            n_est, new_state = self._fwd.apply(
                params, state, rng, batch["points"], batch["n_eff"],
                is_training, bn_momentum,
            )
        return {"n_pred": n_est}, new_state

    def loss(self, outputs, batch):
        loss, cos_ang = normal_loss(outputs["n_pred"], batch["normals"], self.cfg.loss_type)
        return loss, {"cos_ang": cos_ang}

    def predict_normals(self, outputs):
        return outputs["n_pred"]
