import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nestinet_tpu.core.config import Config
from nestinet_tpu.models import build_model
from nestinet_tpu.ops.gmm import get_3d_grid_gmm

B, N = 4, 16


def _batch(rng, n_scales, with_noise=False):
    batch = {
        "points": jnp.asarray(
            rng.uniform(-1, 1, size=(B, n_scales * N, 3)), jnp.float32
        ),
        "n_eff": jnp.asarray(rng.randint(8, N + 1, size=(B, n_scales)), jnp.int32),
        "normals": jnp.asarray(rng.randn(B, 3), jnp.float32),
    }
    if with_noise:
        batch["noise"] = jnp.asarray(rng.rand(B), jnp.float32)
    return batch


def _cfg(model, radii):
    return Config(
        model=model,
        patch_radius=tuple(radii),
        num_gaussians=3,
        gmm_variance=0.111,
        n_experts=7,
    )


@pytest.mark.parametrize(
    "model,radii,with_noise",
    [
        ("ss_norm_est", [0.05], False),
        ("ms_norm_est", [0.01, 0.03, 0.05], False),
        ("ms_sw_n_est", [0.01, 0.05], True),
    ],
)
def test_single_prediction_models(rng, model, radii, with_noise):
    cfg = _cfg(model, radii)
    gmm = get_3d_grid_gmm([3, 3, 3], variance=cfg.gmm_variance)
    m = build_model(cfg, gmm)
    batch = _batch(rng, cfg.n_scales, with_noise)

    key = jax.random.PRNGKey(0)
    params, state = m.init(key, batch)
    outputs, new_state = m.apply(params, state, key, batch, True, 0.9)
    assert outputs["n_pred"].shape == (B, 3)
    loss, aux = m.loss(outputs, batch)
    assert np.isfinite(float(loss))
    assert m.predict_normals(outputs).shape == (B, 3)

    # BN state must update in train mode and stay put in eval mode.
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)), state, new_state
    )
    assert any(jax.tree.leaves(changed))
    _, eval_state = m.apply(params, new_state, None, batch, False, 0.9)
    same = jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), new_state, eval_state
    )
    assert all(jax.tree.leaves(same))


def test_experts_model(rng):
    cfg = _cfg("experts_n_est", [0.01, 0.03, 0.05])
    gmm = get_3d_grid_gmm([3, 3, 3], variance=cfg.gmm_variance)
    m = build_model(cfg, gmm)
    batch = _batch(rng, 3)

    key = jax.random.PRNGKey(1)
    params, state = m.init(key, batch)

    # grouping: 6 single-scale experts + 1 all-scales expert
    assert [g.n_scales for g in m.groups] == [1, 3]
    assert m.groups[0].indices == [0, 1, 2, 3, 4, 5]
    assert m.groups[1].indices == [6]
    assert m.groups[0].starts == [0, 0, 20, 20, 40, 40]
    assert m.groups[1].starts == [0]

    outputs, _ = m.apply(params, state, None, batch, True, 0.9)
    assert outputs["n_pred"].shape == (7, B, 3)
    assert outputs["experts_prob"].shape == (7, B)
    np.testing.assert_allclose(
        np.asarray(outputs["experts_prob"]).sum(0), np.ones(B), atol=1e-5
    )

    loss, aux = m.loss(outputs, batch)
    assert np.isfinite(float(loss))

    normals = np.asarray(m.predict_normals(outputs))
    idx, probs = m.predict_experts(outputs)
    idx = np.asarray(idx)
    assert normals.shape == (B, 3)
    assert probs.shape == (B, 7)
    # argmax expert's normal must be the selected one
    npred = np.asarray(outputs["n_pred"])
    for b in range(B):
        np.testing.assert_allclose(normals[b], npred[idx[b], b])


def test_experts_grads_flow(rng):
    cfg = _cfg("experts_n_est", [0.01, 0.03, 0.05])
    gmm = get_3d_grid_gmm([3, 3, 3], variance=cfg.gmm_variance)
    m = build_model(cfg, gmm)
    batch = _batch(rng, 3)
    params, state = m.init(jax.random.PRNGKey(2), batch)

    def loss_fn(p):
        outputs, _ = m.apply(p, state, None, batch, True, 0.9)
        loss, _ = m.loss(outputs, batch)
        return loss

    grads = jax.grad(loss_fn)(params)
    norms = jax.tree.map(lambda g: float(jnp.sum(jnp.abs(g))), grads)
    leaves = jax.tree.leaves(norms)
    assert all(np.isfinite(leaves))
    # every parameter group must receive some gradient signal
    assert float(sum(jax.tree.leaves(jax.tree.map(lambda g: float(jnp.sum(jnp.abs(g))), grads["manager"])))) > 0
    for gi in range(len(m.groups)):
        assert float(sum(jax.tree.leaves(jax.tree.map(lambda g: float(jnp.sum(jnp.abs(g))), grads[f"group{gi}"])))) > 0


def test_moe_loss_types(rng):
    from nestinet_tpu.models.losses import moe_loss, normal_loss

    n_pred = jnp.asarray(rng.randn(7, B, 3), jnp.float32)
    n_gt = jnp.asarray(rng.randn(B, 3), jnp.float32)
    probs = jax.nn.softmax(jnp.asarray(rng.randn(7, B), jnp.float32), axis=0)
    for lt in ("cos", "euclidean", "sin"):
        for et in ("simple", "gaussian"):
            loss, cos_ang = moe_loss(n_pred, n_gt, probs, lt, et)
            assert np.isfinite(float(loss))
            assert cos_ang.shape == (7, B)
        loss1, _ = normal_loss(n_pred[0], n_gt, lt)
        assert np.isfinite(float(loss1))


def test_loss_sign_flip_invariance(rng):
    """Unoriented losses must be invariant to flipping either normal."""
    from nestinet_tpu.models.losses import normal_loss

    n_pred = jnp.asarray(rng.randn(B, 3), jnp.float32)
    n_gt = jnp.asarray(rng.randn(B, 3), jnp.float32)
    for lt in ("cos", "euclidean", "sin"):
        l0, _ = normal_loss(n_pred, n_gt, lt)
        l1, _ = normal_loss(-n_pred, n_gt, lt)
        l2, _ = normal_loss(n_pred, -n_gt, lt)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
        np.testing.assert_allclose(float(l0), float(l2), rtol=1e-5)


@pytest.mark.fast
def test_switching_noise_head_alive_at_init(rng):
    """The noise head's output ReLU sits on a linear layer whose inputs
    are post-ReLU (all >= 0): a zero-bias init can start (and with MSE's
    zero gradient through a dead ReLU, stay) at exactly 0 for every
    sample — round 2's 100%%-one-branch failure.  The positive bias init
    must keep the head alive: noise_pred > 0 at init and the noise-MSE
    gradient into the noise tower nonzero."""
    cfg = dataclasses.replace(_cfg("ms_sw_n_est", [0.01, 0.05]), tiny_backbone=True)
    gmm = get_3d_grid_gmm([3, 3, 3], variance=cfg.gmm_variance)
    m = build_model(cfg, gmm)
    batch = _batch(rng, 2, with_noise=True)
    params, state = m.init(jax.random.PRNGKey(3), batch)

    outputs, _ = m.apply(params, state, None, batch, True, 0.9)
    noise_pred = np.asarray(outputs["noise_pred"])
    assert (noise_pred > 0).all(), "noise head dead at init"

    def noise_mse(p):
        outputs, _ = m.apply(p, state, None, batch, True, 0.9)
        return jnp.mean(jnp.square(outputs["noise_pred"] - batch["noise"]))

    grads = jax.grad(noise_mse)(params)
    g_noise = sum(
        float(jnp.sum(jnp.abs(g)))
        for k, g in jax.tree_util.tree_leaves_with_path(grads)
        if "noise" in jax.tree_util.keystr(k)
    )
    assert g_noise > 0, "no MSE gradient reaches the noise tower"
