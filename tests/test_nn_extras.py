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
