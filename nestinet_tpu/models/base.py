"""Common model scaffolding.

Models expose a uniform functional API (pure, jit/pjit-friendly):

    model = SomeModel(cfg, gmm)
    params, state = model.init(rng, batch)
    outputs, new_state = model.apply(params, state, rng, batch,
                                     is_training, bn_momentum)
    loss, aux = model.loss(outputs, batch)
    normals = model.predict_normals(outputs)          # [B, 3]

`batch` is a dict with:
    points:  [B, n_scales * N, 3]  per-scale concatenated patches
    n_eff:   [B, n_scales]         effective point counts
    normals: [B, 3]                ground-truth normals (absent at test)
    noise:   [B]                   per-shape noise level (switching model)

GMM parameters are baked into the compiled graph as device-resident
constants — the reference re-fed w/mu/sigma through feed_dict every step
(`train_n_est_w_experts.py:284-286`), which we deliberately do not copy.
"""

from __future__ import annotations

import haiku as hk
import jax.numpy as jnp
import numpy as np

from ..ops.mups import mups
from ..ops.nn import DenseBN, dropout


class ModelBase:
    def __init__(self, cfg, gmm):
        self.cfg = cfg
        self.gmm = gmm
        w, mu, sigma = gmm.astuple()
        self._w = np.asarray(w, np.float32)
        self._mu = np.asarray(mu, np.float32)
        self._sigma = np.asarray(sigma, np.float32)
        self.resolution = gmm.resolution
        # int8: MAC-heavy conv/matmul inner products run quantized on the
        # MXU (ops/quant.py); everything elementwise stays in bfloat16.
        self.quantize = cfg.compute_dtype == "int8"
        # BN-folded serving (ops/fold.py): eval BN affines folded into
        # the preceding kernels at checkpoint load.  Serving-only; the
        # trainer clears this (EMA state must keep updating).
        self.fold_bn = bool(getattr(cfg, "fold_bn", False))
        self.compute_dtype = (
            jnp.bfloat16
            if cfg.compute_dtype in ("bfloat16", "int8")
            else jnp.float32
        )
        impl = getattr(cfg, "mups_impl", "auto")
        if impl == "auto":
            # Resolved at model-construction time (host side): the fused
            # Pallas kernel on real TPU backends, XLA fusion elsewhere.
            import jax

            impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
        self.mups_impl = impl

    # ---- shared pieces ----
    def quant_ctx(self, is_training: bool = False):
        """Trace-time serving context around CNN applies: enables int8
        conv/matmul kernels when cfg.compute_dtype == "int8" and skips
        eval BatchNorms when serving a BN-folded tree (cfg.fold_bn;
        restore_model pairs the flag with the folded checkpoint).
        Training always runs the float, unfolded path."""
        import contextlib

        from ..ops import fold, quant

        stack = contextlib.ExitStack()
        stack.enter_context(quant.quantized(self.quantize and not is_training))
        stack.enter_context(fold.folded(self.fold_bn and not is_training))
        return stack

    def _mups_grid(self, points, n_eff):
        """[B, res, res, res, 20 * n_scales] statistics grid (float32)."""
        return mups(
            points.astype(jnp.float32),
            n_eff,
            jnp.asarray(self._w),
            jnp.asarray(self._mu),
            jnp.asarray(self._sigma),
            n_scales=self.cfg.n_scales,
            resolution=self.resolution,
            impl=self.mups_impl,
        )

    # ---- API to implement ----
    def init(self, rng, batch):
        raise NotImplementedError

    def init_jitted(self, rng, batch):
        """`init` under one jax.jit.

        The eager init path dispatches hundreds of tiny executables —
        negligible locally but minutes of round-trips through a remote
        TPU tunnel; one compiled program (persistently cacheable) fixes
        that.  Prefer this at every production call site.
        """
        if getattr(self, "_jit_init", None) is None:
            import jax

            self._jit_init = jax.jit(self.init)
        return self._jit_init(rng, batch)

    def apply(self, params, state, rng, batch, is_training, bn_momentum):
        raise NotImplementedError

    def loss(self, outputs, batch):
        raise NotImplementedError

    def predict_normals(self, outputs):
        raise NotImplementedError


def fc_head(
    x,
    hidden,
    final_units,
    *,
    is_training,
    bn_momentum,
    dropout_rate: float = 0.0,
    final_activation=None,
    final_w_init=None,
    final_b_init=None,
    name: str = "fc",
):
    """The reference's FC head shape: BN on every hidden layer, optional
    dropout between layers, configurable final activation/init."""
    for i, units in enumerate(hidden):
        x = DenseBN(units, bn=True, name=f"{name}{i + 1}")(x, is_training, bn_momentum)
        if dropout_rate > 0.0:
            x = dropout(x, dropout_rate, is_training)
    x = DenseBN(
        final_units, bn=False, activation=final_activation,
        w_init=final_w_init, b_init=final_b_init,
        name=f"{name}{len(hidden) + 1}"
    )(x, is_training, bn_momentum)
    return x
