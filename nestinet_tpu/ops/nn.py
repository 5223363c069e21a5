"""Neural-net building blocks (haiku) for the 3D-Inception CNNs.

Capability parity with the reference ops layer (`utils/tf_util.py`):
  * `ConvBN3D`        ~ `conv3d` (`tf_util.py:254-311`): xavier-uniform
    kernel, zero bias, optional hand-rolled EMA BatchNorm, ReLU.
  * `DenseBN`         ~ `fully_connected` (`tf_util.py:314-351`) — without
    reproducing the misspelled `weigth_decay` kwarg.
  * `BatchNormEMA`    ~ `batch_norm_template` (`tf_util.py:458-495`):
    batch moments at train time, zero-debiased exponential moving average
    at eval time, with the *scheduled* decay passed per call (the
    reference's bn_decay schedule tensor, `train_n_est_w_experts.py:154-162`).
  * `max_pool3d` / `avg_pool3d` ~ `tf_util.py:406-455`; average pooling
    replicates TF's SAME-padding semantics (padded cells are excluded
    from the mean, i.e. border windows divide by the valid count).
  * `inception3d`     ~ the model files' `inception_module`
    (`experts_n_est.py:294-314`): 1x1x1 conv n, two parallel k^3 convs of
    n/2 each on the 1x1x1 output, and avgpool->1x1x1 conv n, channel
    concatenated (3n output channels).

Everything takes `is_training` and `bn_momentum` as call arguments so a
single compiled graph serves both the scheduled-BN training step and
evaluation.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import haiku as hk
import jax
import jax.numpy as jnp

from . import fold, quant

# Xavier / Glorot uniform, matching tf.contrib.layers.xavier_initializer.
xavier_uniform = hk.initializers.VarianceScaling(1.0, "fan_avg", "uniform")


class ActQ(NamedTuple):
    """A float activation paired with a scalar upper bound on |x|.

    int8 serving only (ops/quant.py): dynamic per-tensor activation
    quantization needs max|x| per conv input, and computing it at the
    CONSUMER costs a standalone full-tensor reduce pass per conv
    (measured ~3 ms/batch across the manager at B=256).  Instead each
    ConvBN3D epilogue emits its output's amax — a reduce XLA fuses into
    the BN/ReLU elementwise epilogue it already runs — and the bound
    rides the dataflow: pools only ever select or average existing
    values (|out| <= amax), concat takes the max over branches.  A
    conservative bound is always VALID for symmetric quantization: no
    clipping, marginally coarser rounding (quality re-pinned in
    QUALITY.md).  Outside `quant.enabled()` tracing, plain tensors flow
    everywhere and nothing changes.
    """

    x: jnp.ndarray
    amax: jnp.ndarray  # scalar f32, >= max|x|


def unwrap(x):
    """(tensor, amax-or-None) from a plain array or an ActQ."""
    if isinstance(x, ActQ):
        return x.x, x.amax
    return x, None


class BatchNormEMA(hk.Module):
    """Batch normalization with a zero-debiased EMA of batch moments.

    Train: normalize with the current batch moments and fold them into the
    moving averages with the (scheduled) `momentum` passed per call.
    Eval: normalize with the debiased moving averages.  This mirrors TF1's
    `ExponentialMovingAverage` applied to moment *tensors* (shadow
    variables start at zero and are zero-debiased).
    """

    def __init__(self, eps: float = 1e-3, name: str | None = None):
        super().__init__(name=name)
        self.eps = eps

    def __call__(self, x: jnp.ndarray, is_training: bool, momentum) -> jnp.ndarray:
        if not is_training and fold.enabled():
            # BN-folded serving (ops/fold.py): the eval affine has been
            # folded into the preceding conv/linear kernel on the host,
            # so this layer is an identity — no parameter/state reads
            # (the folded tree no longer carries them).
            return x
        c = x.shape[-1]
        # Parameters live in float32 regardless of compute dtype (mixed
        # precision: master weights f32, activations cast per-op).
        beta = hk.get_parameter("beta", [c], jnp.float32, init=jnp.zeros).astype(x.dtype)
        gamma = hk.get_parameter("gamma", [c], jnp.float32, init=jnp.ones).astype(x.dtype)

        axes = tuple(range(x.ndim - 1))
        ema_mean = hk.get_state("ema_mean", [c], jnp.float32, init=jnp.zeros)
        ema_var = hk.get_state("ema_var", [c], jnp.float32, init=jnp.zeros)
        # Product of decays so far; debiased average = shadow / (1 - bias).
        bias = hk.get_state("bias", [], jnp.float32, init=jnp.ones)

        if is_training:
            # Moments accumulate in float32 even under bfloat16 compute.
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.var(xf, axis=axes)
            m = jnp.asarray(momentum, jnp.float32)
            hk.set_state("ema_mean", m * ema_mean + (1.0 - m) * mean)
            hk.set_state("ema_var", m * ema_var + (1.0 - m) * var)
            hk.set_state("bias", m * bias)
        else:
            denom = jnp.maximum(1.0 - bias, 1e-12)
            mean = (ema_mean / denom).astype(x.dtype)
            var = (ema_var / denom).astype(x.dtype)

        inv = gamma * jax.lax.rsqrt(var.astype(x.dtype) + self.eps)
        return (x - mean.astype(x.dtype)) * inv + beta


class _Conv3DParamF32(hk.Module):
    """3D conv with float32 master parameters, computed in the input's
    dtype (mixed precision without global haiku policies).  Parameter
    names/shapes match hk.Conv3D ('w' [k,k,k,cin,cout], 'b' [cout]), so
    checkpoints are interchangeable with the plain-f32 layer."""

    def __init__(self, output_channels, kernel_shape, stride, name=None):
        super().__init__(name=name)
        self.out = int(output_channels)
        self.kernel = tuple(kernel_shape)
        self.stride = (stride,) * 3 if isinstance(stride, int) else tuple(stride)

    def __call__(self, x, x_amax=None):
        cin = x.shape[-1]
        w = hk.get_parameter(
            "w", self.kernel + (cin, self.out), jnp.float32, init=xavier_uniform
        )
        b = hk.get_parameter("b", [self.out], jnp.float32, init=jnp.zeros)
        if quant.enabled():
            # Statically pre-quantized checkpoint (quantize_params_np):
            # the tree carries an int8 kernel + its per-cout scales.
            # w.dtype is trace-time static, so this branch costs nothing.
            w_scale = None
            if w.dtype == jnp.int8:
                w_scale = hk.get_parameter(
                    "w_scale", [self.out], jnp.float32, init=jnp.ones
                )
            return quant.conv_nd_int8(
                x, w, b, window_strides=self.stride,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                w_scale=w_scale, x_amax=x_amax,
            )
        out = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=self.stride,
            padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return out + b.astype(x.dtype)


class _LinearParamF32(hk.Module):
    """Linear with float32 master parameters ('w' [in,out], 'b' [out]),
    computed in the input's dtype; checkpoint-compatible with hk.Linear."""

    def __init__(self, units, name=None, w_init=None, b_init=None):
        super().__init__(name=name)
        self.units = int(units)
        self.w_init = xavier_uniform if w_init is None else w_init
        self.b_init = jnp.zeros if b_init is None else b_init

    def __call__(self, x, x_amax=None):
        w = hk.get_parameter(
            "w", [x.shape[-1], self.units], jnp.float32, init=self.w_init
        )
        b = hk.get_parameter("b", [self.units], jnp.float32, init=self.b_init)
        if quant.enabled():
            w_scale = None
            if w.dtype == jnp.int8:  # statically pre-quantized tree
                w_scale = hk.get_parameter(
                    "w_scale", [self.units], jnp.float32, init=jnp.ones
                )
            return quant.linear_int8(x, w, b, w_scale=w_scale, x_amax=x_amax)
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


class ConvBN3D(hk.Module):
    """3D conv + bias (+ EMA BatchNorm) (+ ReLU), NDHWC, SAME padding."""

    def __init__(
        self,
        channels: int,
        kernel: int | Sequence[int],
        *,
        stride: int = 1,
        bn: bool = True,
        activation=jax.nn.relu,
        name: str | None = None,
    ):
        super().__init__(name=name)
        self.channels = channels
        self.kernel = kernel if isinstance(kernel, (tuple, list)) else (kernel,) * 3
        self.stride = stride
        self.bn = bn
        self.activation = activation

    def __call__(self, x, is_training, bn_momentum):
        x, x_amax = unwrap(x)
        x = _Conv3DParamF32(
            output_channels=self.channels,
            kernel_shape=tuple(self.kernel),
            stride=self.stride,
            name="conv",
        )(x, x_amax=x_amax)
        if self.bn:
            x = BatchNormEMA(name="bn")(x, is_training, bn_momentum)
        if self.activation is not None:
            x = self.activation(x)
        if quant.enabled():
            # Emit this output's amax for the NEXT quantized consumer:
            # the reduce fuses into the BN/ReLU epilogue pass above
            # (multi-output fusion), replacing the consumer's standalone
            # full-tensor re-read (see ActQ).
            return ActQ(x, jnp.max(jnp.abs(x)).astype(jnp.float32))
        return x


class DenseBN(hk.Module):
    """Linear + bias (+ EMA BatchNorm) (+ activation)."""

    def __init__(
        self,
        units: int,
        *,
        bn: bool = False,
        activation=jax.nn.relu,
        w_init=None,
        b_init=None,
        name: str | None = None,
    ):
        super().__init__(name=name)
        self.units = units
        self.bn = bn
        self.activation = activation
        self.w_init = w_init
        self.b_init = b_init

    def __call__(self, x, is_training, bn_momentum):
        x, x_amax = unwrap(x)
        x = _LinearParamF32(
            self.units, name="linear", w_init=self.w_init, b_init=self.b_init
        )(x, x_amax=x_amax)
        if self.bn:
            x = BatchNormEMA(name="bn")(x, is_training, bn_momentum)
        if self.activation is not None:
            x = self.activation(x)
        # FC activations are tiny ([B, <=1536]); a consumer-side amax
        # costs nothing measurable, so DenseBN returns a plain tensor
        # and the ActQ chain ends at the backbone flatten.
        return x


class ConvBNND(hk.Module):
    """N-dimensional conv + bias (+ EMA BatchNorm) (+ activation) for
    1D/2D feature maps — capability parity with the reference's unused
    `conv1d` / `conv2d` wrappers (`tf_util.py:57-196`).  Channels-last,
    SAME padding, float32 master parameters."""

    _DIMS = {1: ("NWC", "WIO", "NWC"), 2: ("NHWC", "HWIO", "NHWC")}

    def __init__(self, ndim: int, channels: int, kernel, *, stride: int = 1,
                 bn: bool = True, activation=jax.nn.relu, name=None):
        super().__init__(name=name)
        self.ndim = int(ndim)
        self.channels = int(channels)
        self.kernel = (
            tuple(kernel) if isinstance(kernel, (tuple, list)) else (kernel,) * ndim
        )
        self.stride = (stride,) * ndim if isinstance(stride, int) else tuple(stride)
        self.bn = bn
        self.activation = activation

    def __call__(self, x, is_training, bn_momentum):
        cin = x.shape[-1]
        w = hk.get_parameter(
            "w", self.kernel + (cin, self.channels), jnp.float32,
            init=xavier_uniform,
        )
        b = hk.get_parameter("b", [self.channels], jnp.float32, init=jnp.zeros)
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=self.stride, padding="SAME",
            dimension_numbers=self._DIMS[self.ndim],
        ) + b.astype(x.dtype)
        if self.bn:
            x = BatchNormEMA(name="bn")(x, is_training, bn_momentum)
        if self.activation is not None:
            x = self.activation(x)
        return x


class ConvTranspose2D(hk.Module):
    """2D transposed conv (parity: `tf_util.py:199-251`), channels-last,
    SAME padding, float32 master parameters."""

    def __init__(self, channels: int, kernel, *, stride: int = 1, name=None):
        super().__init__(name=name)
        self.channels = int(channels)
        self.kernel = (
            tuple(kernel) if isinstance(kernel, (tuple, list)) else (kernel,) * 2
        )
        self.stride = (stride,) * 2 if isinstance(stride, int) else tuple(stride)

    def __call__(self, x):
        cin = x.shape[-1]
        w = hk.get_parameter(
            "w", self.kernel + (self.channels, cin), jnp.float32,
            init=xavier_uniform,
        )
        b = hk.get_parameter("b", [self.channels], jnp.float32, init=jnp.zeros)
        out = jax.lax.conv_transpose(
            x, w.astype(x.dtype), strides=self.stride, padding="SAME",
            dimension_numbers=("NHWC", "HWOI", "NHWC"),
        )
        return out + b.astype(x.dtype)


def max_pool2d(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """2D max pool, SAME padding, NHWC (parity: `tf_util.py:354-380`)."""
    dims = (1, kernel, kernel, 1)
    strides = (1, stride, stride, 1)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, padding="SAME"
    )


def avg_pool2d(x: jnp.ndarray, kernel: int, stride: int) -> jnp.ndarray:
    """2D average pool, SAME padding, valid-count semantics
    (parity: `tf_util.py:381-405`)."""
    dims = (1, kernel, kernel, 1)
    strides = (1, stride, stride, 1)
    sums = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, padding="SAME")
    counts = jax.lax.reduce_window(
        jnp.ones(x.shape[1:-1], x.dtype)[None, ..., None],
        0.0, jax.lax.add, dims, strides, padding="SAME",
    )
    return sums / counts


def max_pool3d(x, kernel: int, stride: int) -> jnp.ndarray:
    """3D max pool, SAME padding, NDHWC.  ActQ inputs keep their bound:
    pooling only selects existing values, so |out| <= amax."""
    x, x_amax = unwrap(x)
    dims = (1, kernel, kernel, kernel, 1)
    strides = (1, stride, stride, stride, 1)
    out = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, padding="SAME"
    )
    return out if x_amax is None else ActQ(out, x_amax)


def avg_pool3d(
    x, kernel: int, stride: int, *, separable: bool = True
) -> jnp.ndarray:
    """3D average pool, SAME padding, excluding padded cells from the
    mean (TF semantics — border windows divide by the valid count).
    ActQ inputs keep their bound (averages of values can't exceed the
    input's amax).

    With `separable` (the inference default): one 1D sum-window per
    spatial axis (3·k adds per position instead of k³) and the
    valid-count divisor as the outer product of per-axis window counts
    — exactly equal to the dense window sum/count up to addition
    reassociation, and measured ~7 ms/batch faster across the flagship
    serving step (the stride-1 k=3 case runs once per inception block
    on the block's full input, the widest tensors in every backbone).
    Training passes separable=False: the two extra full-size
    intermediates the separable form keeps live tipped the flagship
    train step over the chip's 15.75 GB HBM (OOM by ~7 MB), and the
    training graph is conv-bound anyway."""
    x, x_amax = unwrap(x)

    def _wrap(out):
        return out if x_amax is None else ActQ(out, x_amax)

    if not separable:
        dims = (1, kernel, kernel, kernel, 1)
        strides = (1, stride, stride, stride, 1)
        sums = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, dims, strides, padding="SAME"
        )
        counts = jax.lax.reduce_window(
            jnp.ones(x.shape[1:-1], x.dtype)[None, ..., None],
            0.0, jax.lax.add, dims, strides, padding="SAME",
        )
        return _wrap(sums / counts)
    sums = x
    for axis in (1, 2, 3):
        dims = [1, 1, 1, 1, 1]
        strides_ = [1, 1, 1, 1, 1]
        dims[axis] = kernel
        strides_[axis] = stride
        sums = jax.lax.reduce_window(
            sums, 0.0, jax.lax.add, tuple(dims), tuple(strides_),
            padding="SAME",
        )
    counts = jnp.asarray(1.0, x.dtype)
    for axis in (1, 2, 3):
        n = x.shape[axis]
        c1 = jax.lax.reduce_window(
            jnp.ones((n,), x.dtype), 0.0, jax.lax.add,
            (kernel,), (stride,), padding="SAME",
        )
        shape = [1, 1, 1, 1, 1]
        shape[axis] = c1.shape[0]
        counts = counts * c1.reshape(shape)
    return _wrap(sums / counts)


class Inception3D(hk.Module):
    """The reference's 3D inception block (3n output channels)."""

    def __init__(self, n_filters: int, kernel_sizes=(3, 5), name: str | None = None):
        super().__init__(name=name)
        self.n = int(n_filters)
        self.k1, self.k2 = kernel_sizes

    def __call__(self, x, is_training, bn_momentum):
        one = ConvBN3D(self.n, 1, name="conv1")(x, is_training, bn_momentum)
        b1 = ConvBN3D(self.n // 2, self.k1, name="conv2")(one, is_training, bn_momentum)
        b2 = ConvBN3D(self.n // 2, self.k2, name="conv3")(one, is_training, bn_momentum)
        cin = unwrap(x)[0].shape[-1]
        if is_training or cin <= self.n:
            # Reference order: stride-1 k1^3 average pool, then 1x1x1
            # conv (+BN+ReLU).  Separable pool only at inference: see
            # avg_pool3d (the separable form's live intermediates OOM
            # the flagship train step's HBM).
            ap = avg_pool3d(x, self.k1, 1, separable=not is_training)
            ap = ConvBN3D(self.n, 1, name="conv4")(ap, is_training, bn_momentum)
        else:
            # Inference, shrinking branch (cin > n): the 1x1x1 conv and
            # the eval BN affine are per-channel linear maps and the
            # count-divisor average pool is a spatial linear map, so
            # conv+BN commute with the pool EXACTLY (up to float
            # reassociation, like the separable pool itself).  Pooling
            # AFTER the conv shrinks the pooled tensor cin/n-fold (768
            # -> 256 on the widest flagship blocks) and lets the conv's
            # input amax/quantize CSE with conv1's (both now read x) —
            # measured win on the manager's stride-1 pools.  ReLU does
            # NOT commute and is applied last, preserving the reference
            # function relu(BN(conv(avgpool(x)))).  Same parameters,
            # same "conv4" module name: checkpoints are unaffected.
            ap = ConvBN3D(self.n, 1, name="conv4", activation=None)(
                x, is_training, bn_momentum
            )
            ap_t, ap_amax = unwrap(ap)
            ap_t = jax.nn.relu(
                unwrap(avg_pool3d(ap_t, self.k1, 1, separable=True))[0]
            )
            # post-ReLU max can only shrink: the conv output's bound
            # stays valid, no fresh reduce needed.
            ap = ap_t if ap_amax is None else ActQ(ap_t, ap_amax)
        parts = [one, b1, b2, ap]
        if all(isinstance(p, ActQ) for p in parts):
            # concat: |out| bound = max over branch bounds (exact).
            return ActQ(
                jnp.concatenate([p.x for p in parts], axis=-1),
                jnp.max(jnp.stack([p.amax for p in parts])),
            )
        return jnp.concatenate([unwrap(p)[0] for p in parts], axis=-1)


def run_backbone(x, spec, is_training, bn_momentum, *, name_prefix: str = ""):
    """Run a backbone given as a list of layer specs and flatten.

    Spec entries:
        ("incep", n_filters, (k1, k2))
        ("maxpool", kernel, stride)
    """
    for i, entry in enumerate(spec):
        kind = entry[0]
        if kind == "incep":
            _, n_filters, ks = entry
            x = Inception3D(n_filters, ks, name=f"{name_prefix}incep{i}")(
                x, is_training, bn_momentum
            )
        elif kind == "maxpool":
            _, k, s = entry
            x = max_pool3d(x, k, s)
        else:
            raise ValueError(f"unknown backbone entry: {entry}")
    x, x_amax = unwrap(x)
    x = x.reshape(x.shape[0], -1)
    # the first FC layer consumes the flattened features; hand it the
    # bound so its quantize pass needs no fresh full-tensor reduce.
    return x if x_amax is None else ActQ(x, x_amax)


def dropout(x, rate: float, is_training: bool):
    if not is_training or rate == 0.0:
        return x
    return hk.dropout(hk.next_rng_key(), rate, x)


def l2_weight_penalty(params) -> jnp.ndarray:
    """Sum of 0.5 * ||W||^2 over weight matrices/kernels (excludes biases
    and BN parameters), matching the reference's 'losses' collection
    semantics (`tf_util.py:36-54`).  Walks arbitrarily nested pytrees of
    haiku parameter dicts."""
    total = jnp.asarray(0.0, jnp.float32)
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, value in flat:
        last = path[-1]
        key = getattr(last, "key", None)
        if key == "w":
            total = total + 0.5 * jnp.sum(jnp.square(value.astype(jnp.float32)))
    return total
