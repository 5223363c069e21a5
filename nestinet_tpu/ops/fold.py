"""Inference-time BatchNorm folding (opt-in, serving only).

At eval, `BatchNormEMA` (ops/nn.py) is a fixed per-channel affine built
from the debiased moving moments:

    y = (x - mean) * gamma / sqrt(var + eps) + beta

Every BN in the framework sits directly on a conv/linear output (the
reference composes them the same way — `tf_util.py:254-311` conv +
`:458-551` BN), so the affine folds exactly into the preceding kernel:

    w' = w * s          (s = gamma / sqrt(var + eps), per cout)
    b' = (b - mean) * s + beta

This removes the BN elementwise chain from every serving layer (the
manager CNN's measured gap above its conv roofline is epilogue work —
docs/PERF.md "Remaining levers" #2) and, composed with int8 serving
(ops/quant.py), shortens the dequant epilogue to a single scale+bias.
Per-output-channel symmetric quantization is invariant to per-channel
weight scaling, so folding does not change int8 rounding error.

Mechanics mirror the static-quantization design: `fold_bn_params_np`
rewrites the checkpointed trees ON THE HOST once at load
(`infer/predict.py::restore_model`), and a trace-time context makes
`BatchNormEMA` an identity at eval.  Training never folds (the EMA
state must keep updating); the trainer forcibly clears the flag.

The fold is exact algebra on the same checkpoint — differences vs the
unfolded path are float-rounding only (pinned by tests/test_fold_bn.py;
six-testset RMS pins in QUALITY.md gate its use as a bench headline).
"""

from __future__ import annotations

import contextlib
import threading

import numpy as np

_state = threading.local()

#: BatchNormEMA's eps default (ops/nn.py) — folding must use the same.
BN_EPS = 1e-3

# Bundle names whose "w"/"b" a sibling BN folds into (the inner modules
# of ConvBN3D / DenseBN; possibly vmap-stacked with a leading member
# axis).  ConvBNND (1D/2D parity wrappers) holds w/b at the parent path
# itself and is handled as the fallback case.
_AFFINE_BUNDLES = ("conv", "linear")


def enabled() -> bool:
    """True while tracing inside a `folded(True)` context."""
    return getattr(_state, "on", False)


@contextlib.contextmanager
def folded(on: bool = True):
    """Trace-time switch: BatchNormEMA becomes identity at eval inside.

    Only valid with params produced by `fold_bn_params_np` — skipping
    BN against an unfolded tree silently changes the math."""
    prev = enabled()
    _state.on = bool(on)
    try:
        yield
    finally:
        _state.on = prev


def folded_param_tree(params) -> bool:
    """True if `fold_bn_params_np` has already run on this tree (no BN
    bundle carries parameters anymore, at any nesting level)."""

    def has_bn(tree) -> bool:
        for key, val in tree.items():
            if _is_bn(key, val):
                return True
            if isinstance(val, dict) and has_bn(val):
                return True
        return False

    return not has_bn(dict(params))


def _is_bn(key: str, val) -> bool:
    return (
        isinstance(val, dict)
        and key.rsplit("/", 1)[-1] == "bn"
        and "gamma" in val
        and "beta" in val
    )


def _debiased_moments(bn_state):
    """Replicates BatchNormEMA's eval read: zero-debiased EMA moments."""
    mean = np.asarray(bn_state["ema_mean"], np.float32)
    var = np.asarray(bn_state["ema_var"], np.float32)
    bias = np.asarray(bn_state["bias"], np.float32)
    denom = np.maximum(1.0 - bias, 1e-12)[..., None]  # [] -> (1,), [E] -> (E,1)
    return mean / denom, var / denom


def fold_bn_params_np(params, state, eps: float = BN_EPS):
    """Fold every eval-time BN affine into its preceding conv/linear.

    Walks the flat haiku trees on the host (numpy float32 — exact
    algebra, no device work).  For each `<parent>/bn` bundle the folded
    kernel lands in `<parent>/conv` or `<parent>/linear` (or `<parent>`
    itself for the ND wrappers), and the BN entries are dropped from
    both trees so a fold can't be applied twice.

    Trees may nest (the grouped vmap-stacked experts hang their flat
    haiku dicts under per-group subtrees); each nesting level is folded
    against its own sibling bundles, with the state tree walked in
    lockstep.

    Raises ValueError if any BN has no foldable affine sibling — the
    all-or-nothing contract the `folded()` context relies on.  Must run
    BEFORE `quant.quantize_params_np` (folds float32 kernels).
    """

    def fold_level(p, s):
        p = {k: dict(v) if isinstance(v, dict) else v for k, v in p.items()}
        s = {k: dict(v) if isinstance(v, dict) else v for k, v in s.items()}

        for key in [k for k, v in p.items() if _is_bn(k, v)]:
            parent = key[: -len("/bn")]
            target = None
            for bundle in _AFFINE_BUNDLES:
                cand = f"{parent}/{bundle}"
                if cand in p and "w" in p[cand]:
                    target = cand
                    break
            if target is None and parent in p and "w" in p[parent]:
                target = parent  # ConvBNND layout: w/b at the module path
            if target is None:
                raise ValueError(
                    f"BN at '{key}' has no conv/linear sibling to fold into"
                )
            if key not in s:
                raise ValueError(f"BN at '{key}' has no EMA state entry")

            gamma = np.asarray(p[key]["gamma"], np.float32)
            beta = np.asarray(p[key]["beta"], np.float32)
            mean, var = _debiased_moments(s[key])
            sc = gamma / np.sqrt(var + eps)  # [c] or [E, c]

            w_raw = p[target]["w"]
            if (
                getattr(w_raw, "dtype", None) == np.int8
                or p[target].get("w_scale") is not None
            ):
                raise ValueError(
                    f"'{target}' is already quantized — fold BN before int8"
                )
            w = np.asarray(w_raw, np.float32)
            b = np.asarray(p[target]["b"], np.float32)
            # Broadcast over the kernel's spatial/cin axes: leading
            # member axes (vmap-stacked groups) line up, cout is last.
            s_w = sc.reshape(
                sc.shape[:-1] + (1,) * (w.ndim - sc.ndim) + sc.shape[-1:]
            )
            p[target]["w"] = (w * s_w).astype(np.float32)
            p[target]["b"] = ((b - mean) * sc + beta).astype(np.float32)
            del p[key]
            del s[key]

        # Recurse into genuine subtrees (dicts containing dicts); leaf
        # bundles hold only arrays and were handled above.
        for k, v in list(p.items()):
            if isinstance(v, dict) and any(
                isinstance(x, dict) for x in v.values()
            ):
                sub_s = s.get(k)
                p[k], new_s = fold_level(
                    v, sub_s if isinstance(sub_s, dict) else {}
                )
                if isinstance(sub_s, dict):
                    s[k] = new_s
        return p, s

    return fold_level(dict(params), dict(state))
