"""int8 quantized serving kernels (opt-in, inference only).

The flagship serving path is conv-roofline-bound at bfloat16 (the 5^3
convs measure at ~100% of the dense-MAC MXU roofline — docs/PERF.md
"Roofline honesty"), so the only single-chip lever past the bf16 ceiling
is running the MACs at int8, where the v5e MXU has 2x the bf16
throughput (394 vs 197 TOPS).

Scheme (standard post-training dynamic quantization):
  * weights: symmetric per-output-channel int8, quantized on the fly
    from the float32 master checkpoint (`w_q = round(w / s_w)`,
    `s_w[cout] = max|w| / 127`) — no separate quantized checkpoint, no
    calibration pass;
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
framework capability on top of parity, and it is opt-in until QUALITY.md
pins the measured RMS delta on the six-testset protocol.
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


def conv_nd_int8(x, w, b, *, window_strides, dimension_numbers):
    """Quantized drop-in for `lax.conv_general_dilated(x, w) + b`.

    x: activations in the compute dtype (any float), channels-last.
    w: float32 master kernel [..., cin, cout].
    b: float32 bias [cout].
    Returns activations in x.dtype.
    """
    out_dtype = x.dtype
    x_q, s_x = _quantize_tensor(x)
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


def linear_int8(x, w, b):
    """Quantized drop-in for `x @ w + b` (w: f32 [cin, cout])."""
    out_dtype = x.dtype
    x_q, s_x = _quantize_tensor(x)
    w_q, s_w = _quantize_weight_per_cout(w)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (s_w * s_x) + b
    return out.astype(out_dtype)
