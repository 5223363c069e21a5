"""Inference-time BatchNorm folding (ops/fold.py).

The fold must be exact algebra: serving a folded tree inside the
`folded()` context has to reproduce the unfolded eval path up to float
rounding, on both the plain (manager CNN) and the vmap-stacked (expert
group) layouts, and compose with static int8 quantization in the
documented order (fold first, then quantize).
"""

import dataclasses

import jax
import numpy as np
import pytest

from nestinet_tpu.core.config import Config
from nestinet_tpu.models import build_model
from nestinet_tpu.ops import fold
from nestinet_tpu.ops.gmm import get_3d_grid_gmm

from .test_int8 import _tiny_batch, _tiny_cfg, _train_few_steps


def _angles_deg(a, b):
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    return np.degrees(np.arccos(np.clip(np.abs((a * b).sum(1)), 0, 1)))


def _eval_outputs(cfg, params, state, batch):
    gmm = get_3d_grid_gmm([cfg.num_gaussians] * 3, variance=cfg.gmm_variance)
    model = build_model(cfg, gmm)
    o, _ = model.apply(params, state, None, batch, False, 0.0)
    return (
        np.array(model.predict_normals(o), np.float32),
        np.array(o["experts_prob"], np.float32),
    )


def test_fold_matches_unfolded_eval_f32():
    cfg = _tiny_cfg("float32")
    batch = _tiny_batch()
    _, params, state = _train_few_steps(cfg, batch)

    n_ref, p_ref = _eval_outputs(cfg, params, state, batch)
    fparams, fstate = fold.fold_bn_params_np(params, state)

    # Every BN bundle must be consumed from BOTH trees.
    assert fold.folded_param_tree(fparams)
    assert not any(k.endswith("/bn") for k in fstate)
    # ... and the original trees were not mutated.
    assert not fold.folded_param_tree(params)

    n_fold, p_fold = _eval_outputs(
        dataclasses.replace(cfg, fold_bn=True), fparams, fstate, batch
    )
    assert np.isfinite(n_fold).all()
    # f32 vs f32: differences are accumulation-order rounding only.
    assert np.abs(p_fold - p_ref).max() < 1e-3
    assert _angles_deg(n_fold, n_ref).max() < 0.05


def test_fold_matches_unfolded_eval_bf16():
    cfg = _tiny_cfg("float32")
    batch = _tiny_batch()
    _, params, state = _train_few_steps(cfg, batch)

    bf = dataclasses.replace(cfg, compute_dtype="bfloat16")
    n_ref, p_ref = _eval_outputs(bf, params, state, batch)
    fparams, fstate = fold.fold_bn_params_np(params, state)
    n_fold, p_fold = _eval_outputs(
        dataclasses.replace(bf, fold_bn=True), fparams, fstate, batch
    )
    # bf16 rounding on this barely-trained tiny fixture dominates (its
    # raw normals are noise-scale) — same bars as the int8-vs-bf16 test;
    # the real-model bf16 fold parity is pinned by QUALITY.md's
    # six-testset runs.
    assert np.isfinite(n_fold).all()
    assert np.abs(p_fold - p_ref).max() < 0.15
    assert _angles_deg(n_fold, n_ref).max() < 10.0


def test_fold_composes_with_static_int8():
    from nestinet_tpu.ops.quant import quantize_params_np

    cfg = _tiny_cfg("float32")
    batch = _tiny_batch()
    _, params, state = _train_few_steps(cfg, batch)

    n_ref, p_ref = _eval_outputs(cfg, params, state, batch)
    fparams, fstate = fold.fold_bn_params_np(params, state)
    qparams = quantize_params_np(fparams)
    n_q, p_q = _eval_outputs(
        dataclasses.replace(cfg, compute_dtype="int8", fold_bn=True),
        qparams, fstate, batch,
    )
    assert np.isfinite(n_q).all() and np.isfinite(p_q).all()
    # Same bars as the unfolded int8-vs-bf16 test (test_int8.py).
    assert np.abs(p_q - p_ref).max() < 0.15
    assert _angles_deg(n_q, n_ref).max() < 10.0


def test_fold_rejects_quantized_tree():
    from nestinet_tpu.ops.quant import quantize_params_np

    cfg = _tiny_cfg("float32")
    batch = _tiny_batch()
    _, params, state = _train_few_steps(cfg, batch, n=2)
    qparams = quantize_params_np(params)
    with pytest.raises(ValueError, match="fold BN before int8"):
        fold.fold_bn_params_np(qparams, state)


def test_fold_rejects_orphan_bn():
    cfg = _tiny_cfg("float32")
    batch = _tiny_batch()
    _, params, state = _train_few_steps(cfg, batch, n=2)
    def find_bn_container(tree):
        for k, v in tree.items():
            if k.endswith("/bn") and isinstance(v, dict) and "gamma" in v:
                return tree, k
            if isinstance(v, dict):
                hit = find_bn_container(v)
                if hit is not None:
                    return hit
        return None

    params = {
        k: dict(v) if isinstance(v, dict) else v for k, v in dict(params).items()
    }
    container, bn_key = find_bn_container(params)
    affine = bn_key[: -len("/bn")]
    for bundle in ("conv", "linear"):
        container.pop(f"{affine}/{bundle}", None)
    with pytest.raises(ValueError, match="no conv/linear sibling"):
        fold.fold_bn_params_np(params, state)


def test_fold_context_is_trace_scoped():
    assert not fold.enabled()
    with fold.folded(True):
        assert fold.enabled()
        with fold.folded(False):
            assert not fold.enabled()
        assert fold.enabled()
    assert not fold.enabled()


def test_trainer_clears_fold_flag(tmp_path):
    """fold_bn must never leak into a training run (BN state would stop
    updating and mid-training validation would skip live BNs)."""
    from nestinet_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(
        _tiny_cfg("float32"), fold_bn=True, log_dir=str(tmp_path / "run")
    )
    t = Trainer(cfg, loader_workers=0)
    assert t.cfg.fold_bn is False
    assert t.model.fold_bn is False
