"""int8 quantized serving kernels (opt-in, inference only).

The flagship serving path is conv-roofline-bound at bfloat16 (the 5^3
convs measure at ~100% of the dense-MAC MXU roofline — docs/PERF.md
"Roofline honesty"), so the only single-chip lever past the bf16 ceiling
is running the MACs at int8, where the v5e MXU has 2x the bf16
throughput (394 vs 197 TOPS).

Scheme (standard post-training dynamic quantization):
  * weights: symmetric per-output-channel int8 (`w_q = round(w / s_w)`,
    `s_w[cout] = max|w| / 127`) — no separate quantized checkpoint, no
    calibration pass.  Serving pre-computes this ONCE on the host at
    checkpoint load (`quantize_params_np`; `infer/predict.py::
    restore_model`) so the device holds int8 kernels + scales; the
    in-graph dynamic path remains for trees that skip the prepass and
    is pinned bit-identical by `tests/test_int8.py`;
  * activations: symmetric per-tensor dynamic int8 (`s_x = max|x|/127`
    computed per call) — one cheap amax reduce per conv, robust to the
    layer-to-layer scale swings of BN-less conv outputs;
  * accumulation: int32 on the MXU (`preferred_element_type`), then one
    fused epilogue `acc * (s_w * s_x) + b` back in the compute dtype.

BatchNorm (EMA affine at eval), ReLU, pooling, softmax and the MuPS
statistics stay in the float compute dtype — only the MAC-heavy conv /
matmul inner products are quantized.

Activation is a trace-time context (`with quantized(True): ...`) that
the conv/linear modules in `ops/nn.py` consult; models enable it in
their eval paths when `cfg.compute_dtype == "int8"` (see
`models/base.py::ModelBase.quant_ctx`).  Training never quantizes.

The reference has no quantization story (TF1 f32 throughout); this is a
framework capability on top of parity.  QUALITY.md ("Serving-mode parity
pins") pins the six-testset RMS delta vs the host-dense f32 anchor at
<=0.014 deg — well inside the ±0.1 deg bar — so int8 is an eligible
bench headline mode; bfloat16 stays the default serving dtype
(`--compute_dtype=int8` selects this path explicitly).
"""

from __future__ import annotations

import contextlib
import threading

import jax
import jax.numpy as jnp

_state = threading.local()


def enabled() -> bool:
    """True while tracing inside a `quantized(True)` context."""
    return getattr(_state, "on", False)


@contextlib.contextmanager
def quantized(on: bool = True):
    """Trace-time switch: conv/linear modules emit int8 MXU ops inside."""
    prev = enabled()
    _state.on = bool(on)
    try:
        yield
    finally:
        _state.on = prev


def _quantize_tensor(x):
    """Symmetric per-tensor int8: returns (x_q int8, scale scalar f32)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return x_q.astype(jnp.int8), scale


def _quantize_weight_per_cout(w):
    """Symmetric per-output-channel int8 for a kernel whose LAST axis is
    the output channel: returns (w_q int8, scale [cout] f32)."""
    reduce_axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127)
    return w_q.astype(jnp.int8), scale


def conv_nd_int8(x, w, b, *, window_strides, dimension_numbers, w_scale=None,
                 x_amax=None):
    """Quantized drop-in for `lax.conv_general_dilated(x, w) + b`.

    x: activations in the compute dtype (any float), channels-last.
    w: float32 master kernel [..., cin, cout], OR a pre-quantized int8
       kernel (then `w_scale` [cout] must be given — the static path
       written by `quantize_params_np`, which skips the per-call f32
       weight read + round/clip and uploads 4x less through the relay).
    b: float32 bias [cout].
    x_amax: optional scalar f32 upper bound of |x|, computed by the
       PRODUCING op's epilogue (ops/nn.py ActQ forwarding).  When given,
       the activation scale is derived from it instead of re-reading the
       whole tensor with a fresh amax reduce — the reduce rides the
       producer's elementwise epilogue (multi-output fusion) and this op
       keeps only the elementwise round/clip pass.  A bound >= max|x|
       (e.g. through an average pool) is VALID: no clipping, marginally
       coarser rounding.
    Returns activations in x.dtype.
    """
    out_dtype = x.dtype
    if x_amax is not None:
        s_x = jnp.maximum(x_amax.astype(jnp.float32), 1e-12) / 127.0
        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s_x), -127, 127
        ).astype(jnp.int8)
    else:
        x_q, s_x = _quantize_tensor(x)
    if w.dtype == jnp.int8:
        w_q, s_w = w, w_scale
    else:
        w_q, s_w = _quantize_weight_per_cout(w)
    acc = jax.lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=window_strides,
        padding="SAME",
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (s_w * s_x) + b
    return out.astype(out_dtype)


def linear_int8(x, w, b, w_scale=None, x_amax=None):
    """Quantized drop-in for `x @ w + b` (w: f32 [cin, cout] or
    pre-quantized int8 with `w_scale` [cout]; `x_amax` as in
    conv_nd_int8)."""
    out_dtype = x.dtype
    if x_amax is not None:
        s_x = jnp.maximum(x_amax.astype(jnp.float32), 1e-12) / 127.0
        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s_x), -127, 127
        ).astype(jnp.int8)
    else:
        x_q, s_x = _quantize_tensor(x)
    if w.dtype == jnp.int8:
        w_q, s_w = w, w_scale
    else:
        w_q, s_w = _quantize_weight_per_cout(w)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (s_w * s_x) + b
    return out.astype(out_dtype)


# ------------------------------------------------ static weight quantization

# Bundle-path leaf names whose "w" is a quantized MAC kernel.  These are
# the inner modules of ops/nn.py's ConvBN3D ("conv", w [k,k,k,cin,cout],
# or [E, k,k,k,cin,cout] for the vmap-stacked expert groups) and DenseBN
# ("linear", w [cin,cout] / [E,cin,cout]).  Other modules (BN, transpose
# convs, 1D/2D parity wrappers) never consult `quant.enabled()` and must
# keep float weights.
_QUANT_BUNDLES = ("conv", "linear")
_QUANT_NDIM = {"conv": (5, 6), "linear": (2, 3)}


def quantized_param_tree(params) -> bool:
    """True if `quantize_params_np` has already run on this tree."""
    import jax.tree_util as jtu

    return any(
        getattr(leaf, "dtype", None) == jnp.int8
        for leaf in jtu.tree_leaves(params)
    )


def quantize_params_np(params):
    """Pre-quantize every conv/linear kernel in a (possibly nested)
    haiku params tree to int8, ON THE HOST, once per checkpoint load.

    Replaces each matching f32 "w" with the int8 kernel and adds a
    sibling "w_scale" leaf holding the symmetric per-output-channel
    scales (per (member, cout) for stacked expert groups — identical
    to what the dynamic path computes per call inside the vmap).  The
    arithmetic matches `_quantize_weight_per_cout` bit-for-bit so
    static and dynamic serving produce identical outputs; serving
    then uploads 1 byte/param instead of 4 through the host->device
    link and skips the per-call weight read+round+clip entirely.

    haiku's apply only shape-checks parameters (not dtype), so the
    mixed tree passes straight through `hk.get_parameter`; the nn.py
    modules branch on `w.dtype == int8` at trace time.
    """
    import numpy as np

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for key, val in tree.items():
            if isinstance(val, dict):
                bundle = key.rsplit("/", 1)[-1]
                if (
                    bundle in _QUANT_BUNDLES
                    and "w" in val
                    and getattr(val["w"], "ndim", 0) in _QUANT_NDIM[bundle]
                ):
                    w = np.asarray(val["w"], np.float32)
                    stacked = w.ndim == _QUANT_NDIM[bundle][1]
                    # reduce all axes except the last (cout) — and except
                    # the leading member axis when vmap-stacked.
                    axes = tuple(range(1 if stacked else 0, w.ndim - 1))
                    amax = np.max(np.abs(w), axis=axes, keepdims=True)
                    scale = np.maximum(amax, 1e-12) / 127.0
                    w_q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
                    newv = dict(val)
                    newv["w"] = w_q
                    # squeeze kept-dim placeholders: [E,1,..,cout]->[E,cout]
                    newv["w_scale"] = scale.reshape(
                        (w.shape[0], w.shape[-1]) if stacked else (w.shape[-1],)
                    ).astype(np.float32)
                    out[key] = newv
                    continue
                out[key] = walk(val)
            else:
                out[key] = val
        return out

    return walk(dict(params))
