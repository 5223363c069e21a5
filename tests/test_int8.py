"""int8 quantized serving kernels (ops/quant.py).

Three layers of evidence, all on the CPU backend (the int8 conv/dot
lower to s8xs8->s32 there exactly as on the TPU MXU):

  1. plumbing exactness — inputs pre-scaled to be losslessly
     representable in int8 must reproduce the float conv/matmul bitwise
     (proves the scale bookkeeping, not just "close");
  2. quantization error bound on realistic float inputs;
  3. model level — a tiny flagship MoE served at compute_dtype="int8"
     stays close to the bfloat16 path and training under int8 is
     rejected (serving-only mode).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nestinet_tpu.core.config import Config
from nestinet_tpu.models import build_model
from nestinet_tpu.ops import quant
from nestinet_tpu.ops.gmm import get_3d_grid_gmm

DIMS3 = ("NDHWC", "DHWIO", "NDHWC")


def _float_conv(x, w, b):
    return (
        jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME", dimension_numbers=DIMS3
        )
        + b
    )


def test_conv_int8_exact_when_losslessly_representable():
    rng = np.random.RandomState(0)
    # Integer-valued tensors whose amax is exactly 127 quantize with
    # scale 1.0 and zero rounding error.
    x = rng.randint(-127, 128, size=(2, 4, 4, 4, 6)).astype(np.float32)
    x.flat[0] = 127.0
    w = rng.randint(-127, 128, size=(3, 3, 3, 6, 5)).astype(np.float32)
    w[0, 0, 0, 0, :] = 127.0  # per-cout amax = 127 for every channel
    b = rng.randn(5).astype(np.float32)
    got = quant.conv_nd_int8(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
        window_strides=(1, 1, 1), dimension_numbers=DIMS3,
    )
    want = _float_conv(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_linear_int8_exact_when_losslessly_representable():
    rng = np.random.RandomState(1)
    x = rng.randint(-127, 128, size=(4, 32)).astype(np.float32)
    x[0, 0] = 127.0
    w = rng.randint(-127, 128, size=(32, 8)).astype(np.float32)
    w[0, :] = 127.0
    b = rng.randn(8).astype(np.float32)
    got = quant.linear_int8(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    want = jnp.asarray(x) @ jnp.asarray(w) + jnp.asarray(b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_conv_int8_error_bound_on_float_inputs():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 8, 8, 8, 12).astype(np.float32)
    w = (rng.randn(5, 5, 5, 12, 16) * 0.1).astype(np.float32)
    b = rng.randn(16).astype(np.float32)
    got = np.asarray(
        quant.conv_nd_int8(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
            window_strides=(1, 1, 1), dimension_numbers=DIMS3,
        )
    )
    want = np.asarray(_float_conv(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    # Dynamic per-tensor activations + per-cout weights: relative error
    # on a well-conditioned conv stays around 1e-2 of the output scale.
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 0.03 * scale


def test_quant_context_is_trace_scoped():
    assert not quant.enabled()
    with quant.quantized(True):
        assert quant.enabled()
        with quant.quantized(False):
            assert not quant.enabled()
        assert quant.enabled()
    assert not quant.enabled()


def _tiny_cfg(dtype):
    return Config(
        model="experts_n_est",
        patch_radius=(0.02, 0.04),
        num_point=8,
        num_gaussians=3,
        gmm_variance=0.111,
        batch_size=4,
        n_experts=4,
        expert_dict={i: [i % 2] for i in range(4)},
        tiny_backbone=True,
        compute_dtype=dtype,
    )


def _tiny_batch():
    rng = np.random.RandomState(3)
    return {
        "points": rng.uniform(-1, 1, size=(4, 2 * 8, 3)).astype(np.float32),
        "n_eff": np.full((4, 2), 8, np.int32),
        "normals": np.tile(np.float32([0, 0, 1]), (4, 1)),
    }


def _train_few_steps(cfg, batch, n=8):
    """A few real train steps so eval-mode BN statistics are sane."""
    from nestinet_tpu.train.train_step import make_optimizer, make_train_step

    gmm = get_3d_grid_gmm([cfg.num_gaussians] * 3, variance=cfg.gmm_variance)
    model = build_model(cfg, gmm)
    params, state = model.init(jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    step = jax.jit(make_train_step(model, cfg, tx), donate_argnums=(0, 1, 2))
    for i in range(n):
        params, state, opt_state, _ = step(
            params, state, opt_state, jax.random.PRNGKey(i), batch,
            jnp.asarray(i, jnp.int32),
        )
    return model, params, state


def test_flagship_int8_serving_close_to_bf16():
    cfg = _tiny_cfg("float32")
    batch = _tiny_batch()
    _, params, state = _train_few_steps(cfg, batch)

    outs = {}
    for dtype in ("bfloat16", "int8"):
        gmm = get_3d_grid_gmm([cfg.num_gaussians] * 3, variance=cfg.gmm_variance)
        model = build_model(dataclasses.replace(cfg, compute_dtype=dtype), gmm)
        o, _ = model.apply(params, state, None, batch, False, 0.0)
        outs[dtype] = (
            np.array(model.predict_normals(o), np.float32),
            np.array(o["experts_prob"], np.float32),
        )

    n8, p8 = outs["int8"]
    nb, pb = outs["bfloat16"]
    assert np.isfinite(n8).all() and np.isfinite(p8).all()
    # Manager probabilities: same distribution up to quantization noise.
    assert np.abs(p8 - pb).max() < 0.15
    # Predicted directions agree within a few degrees.
    n8 /= np.linalg.norm(n8, axis=1, keepdims=True)
    nb /= np.linalg.norm(nb, axis=1, keepdims=True)
    ang = np.degrees(np.arccos(np.clip(np.abs((n8 * nb).sum(1)), 0, 1)))
    assert ang.max() < 10.0, ang


def test_static_weight_quantization_matches_dynamic():
    """`quantize_params_np` (host pre-quantized int8 kernels + scales in
    the params tree — what int8 serving now uploads) must produce the
    SAME numbers as the in-graph dynamic weight quantization: identical
    arithmetic (`_quantize_weight_per_cout`), different execution site."""
    cfg = _tiny_cfg("float32")
    batch = _tiny_batch()
    _, params, state = _train_few_steps(cfg, batch)

    gmm = get_3d_grid_gmm([cfg.num_gaussians] * 3, variance=cfg.gmm_variance)
    model = build_model(dataclasses.replace(cfg, compute_dtype="int8"), gmm)

    o_dyn, _ = model.apply(params, state, None, batch, False, 0.0)
    params_q = quant.quantize_params_np(jax.device_get(params))
    assert quant.quantized_param_tree(params_q)
    assert not quant.quantized_param_tree(params)
    o_sta, _ = model.apply(params_q, state, None, batch, False, 0.0)

    np.testing.assert_allclose(
        np.array(model.predict_normals(o_dyn), np.float32),
        np.array(model.predict_normals(o_sta), np.float32),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.array(o_dyn["experts_prob"], np.float32),
        np.array(o_sta["experts_prob"], np.float32),
        rtol=0, atol=1e-5,
    )
    # every conv/linear kernel actually got the int8 treatment
    n_q = sum(
        1
        for bundle, leaves in params_q.items()
        if isinstance(leaves, dict) and "w_scale" in leaves
    )

    def count_kernels(tree):
        total = 0
        for key, val in tree.items():
            if isinstance(val, dict):
                if key.rsplit("/", 1)[-1] in ("conv", "linear") and "w" in val:
                    total += 1
                else:
                    total += count_kernels(val)
        return total

    assert n_q == 0  # flagship tree nests under group/manager dicts
    assert count_kernels(params_q) == count_kernels(params) > 0
    q_kernels = []

    def collect(tree):
        for key, val in tree.items():
            if isinstance(val, dict):
                if key.rsplit("/", 1)[-1] in ("conv", "linear") and "w" in val:
                    q_kernels.append(val)
                else:
                    collect(val)

    collect(params_q)
    assert all(k["w"].dtype == np.int8 and "w_scale" in k for k in q_kernels)


def test_int8_training_rejected():
    from nestinet_tpu.train.trainer import Trainer

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        cfg = dataclasses.replace(
            _tiny_cfg("int8"), log_dir=d + "/run", data_path=d,
            data_parallel=1, expert_parallel=1,
        )
        with pytest.raises(ValueError, match="serving-only"):
            Trainer(cfg).fit(max_epoch=1)
