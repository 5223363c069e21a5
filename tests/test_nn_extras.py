"""1D/2D conv + pooling wrappers (ops-layer parity with the reference's
`tf_util.py:57-251, 354-405`; unused by the normal-estimation models but
part of the inventoried ops surface)."""

import haiku as hk
import jax
import jax.numpy as jnp
import numpy as np

from nestinet_tpu.ops.nn import (
    ConvBNND,
    ConvTranspose2D,
    avg_pool2d,
    max_pool2d,
)


def test_conv1d_2d_shapes(rng):
    def f1(x, t, m):
        return ConvBNND(1, 8, 3)(x, t, m)

    def f2(x, t, m):
        return ConvBNND(2, 8, 3, stride=2)(x, t, m)

    t1 = hk.transform_with_state(f1)
    x1 = jnp.asarray(rng.randn(2, 16, 4), jnp.float32)
    p, s = t1.init(jax.random.PRNGKey(0), x1, True, 0.9)
    y, _ = t1.apply(p, s, None, x1, True, 0.9)
    assert y.shape == (2, 16, 8)
    assert jax.tree.leaves(p)[0].dtype == jnp.float32

    t2 = hk.transform_with_state(f2)
    x2 = jnp.asarray(rng.randn(2, 16, 16, 4), jnp.float32)
    p, s = t2.init(jax.random.PRNGKey(0), x2, True, 0.9)
    y, _ = t2.apply(p, s, None, x2, True, 0.9)
    assert y.shape == (2, 8, 8, 8)  # stride 2, SAME


def test_conv_transpose2d_upsamples(rng):
    def f(x):
        return ConvTranspose2D(6, 4, stride=2)(x)

    t = hk.transform(f)
    x = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    p = t.init(jax.random.PRNGKey(0), x)
    y = t.apply(p, None, x)
    assert y.shape == (2, 16, 16, 6)


def test_pool2d_semantics():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    mp = max_pool2d(x, 2, 2)
    np.testing.assert_allclose(
        np.asarray(mp)[0, :, :, 0], [[5, 7], [13, 15]]
    )
    ap = avg_pool2d(x, 2, 2)
    np.testing.assert_allclose(
        np.asarray(ap)[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]]
    )
    # SAME border: valid-count mean (TF semantics), not zero-padded mean.
    # k=3,s=3 on 4x4 pads 1 cell on each side; the (0,0) window's valid
    # cells are rows 0-1 x cols 0-1 -> mean of [0,1,4,5], NOT /9.
    ap3 = avg_pool2d(x, 3, 3)
    np.testing.assert_allclose(np.asarray(ap3)[0, 0, 0, 0], 2.5)


def test_inception_avgpool_swap_matches_reference_order():
    """Eval-mode Inception3D with cin > n pools AFTER the 1x1x1 conv
    (ops/nn.py swap branch).  conv + eval-BN affine are per-channel
    linear and the count-divisor average pool is spatial linear, so the
    swap must equal the reference order relu(BN(conv(avgpool(x)))) up to
    float reassociation.  Pinned here directly on the conv4 algebra."""
    import functools

    from nestinet_tpu.ops import nn as nnops

    rng_np = np.random.RandomState(0)
    x = jnp.asarray(rng_np.randn(2, 8, 8, 8, 12), jnp.float32)

    def f_ref(x, is_training):
        ap = nnops.avg_pool3d(x, 3, 1, separable=True)
        return nnops.ConvBN3D(4, 1, name="conv4")(ap, is_training, 0.5)

    def f_swap(x, is_training):
        y = nnops.ConvBN3D(4, 1, name="conv4", activation=None)(
            x, is_training, 0.5
        )
        y = nnops.unwrap(y)[0]
        return jax.nn.relu(
            nnops.unwrap(nnops.avg_pool3d(y, 3, 1, separable=True))[0]
        )

    ref = hk.transform_with_state(f_ref)
    swap = hk.transform_with_state(f_swap)
    params, state0 = ref.init(jax.random.PRNGKey(0), x, True)
    # one training call to populate the BN EMA (eval divides by 1-bias)
    _, state = ref.apply(params, state0, None, x, True)
    out_ref, _ = ref.apply(params, state, None, x, False)
    # production trains in reference order and only swaps at EVAL: the
    # swap graph must therefore reproduce out_ref from the SAME params
    # and reference-trained BN state (identical tree: same module names).
    out_swap, _ = swap.apply(params, state, None, x, False)
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_swap), rtol=2e-4, atol=2e-5
    )
