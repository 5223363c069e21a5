"""Jitted training / evaluation steps.

One compiled SPMD program per (model, mesh): batch sharded over the
"data" mesh axis, parameters replicated (expert stacks optionally sharded
over "expert"), donated argument buffers, scheduled lr and BN decay
computed in-graph from the step counter — replacing the reference's
per-step feed_dict round trip (`train_n_est_w_experts.py:281-290`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..ops.nn import l2_weight_penalty
from .mesh import (
    batch_sharding,
    opt_state_shardings,
    param_shardings,
    replicated,
)
from .schedules import bn_momentum_schedule, learning_rate_schedule


def make_optimizer(cfg) -> optax.GradientTransformation:
    lr = learning_rate_schedule(cfg)
    if cfg.optimizer == "adam":
        return optax.adam(learning_rate=lr)
    if cfg.optimizer == "momentum":
        return optax.sgd(learning_rate=lr, momentum=cfg.momentum)
    raise ValueError(f"unknown optimizer: {cfg.optimizer}")


def _startup_barrier(params, batch):
    """A zero-valued scalar whose computation forces one tiny collective
    over each sharded axis BEFORE any real work (summing a batch-sharded
    input syncs the data groups; summing an expert-sharded parameter
    syncs the expert groups).

    Why (CPU virtual meshes only): XLA:CPU's in-process collectives
    abort the whole process when a rendezvous stays incomplete for a
    hard-coded 40 s (rendezvous.cc).  On small hosts the virtual
    devices timeshare cores, so partition start times can stagger by
    more than the window and the FIRST mid-program collective (after a
    whole forward pass of per-partition compute) trips it.  Arriving at
    a near-free barrier first synchronizes the partitions while their
    pending compute is still tiny; afterwards the program's own dense
    collective traffic keeps them in lockstep.  On TPU this is not
    needed (hardware runs partitions truly concurrently) and the
    barrier is not inserted."""
    total = jnp.sum(batch["points"])
    # Touch every parameter leaf so the expert-sharded stacks (whichever
    # leaves those are) contribute their axis's collective; replicated
    # leaves reduce locally and add nothing.
    for leaf in jax.tree.leaves(params):
        total = total + jnp.sum(leaf.astype(jnp.float32))
    # If any parameter leaf has gone non-finite, the sum would turn this
    # "zero" into NaN and poison the batch, masking the true divergence
    # site — clamp before scaling.
    total = jnp.where(jnp.isfinite(total), total, jnp.float32(0.0))
    # A plain `* 0.0` would be constant-folded and the collectives
    # dead-code-eliminated; the optimization barrier pins the sums and
    # the 1e-38 scale is far below f32 resolution of any real
    # coordinate, so downstream numerics are bit-identical.
    return jax.lax.optimization_barrier(total) * jnp.float32(1e-38)


def make_train_step(model, cfg, tx):
    """Returns train_step(params, state, opt_state, rng, batch, step)."""
    bn_sched = bn_momentum_schedule(cfg)
    # The barrier only matters for XLA:CPU's in-process collectives on
    # virtual multi-device meshes; single-device steps have no
    # rendezvous to protect and skip the full-params reduction.
    cpu_backend = jax.default_backend() == "cpu" and len(jax.devices()) > 1

    def train_step(params, state, opt_state, rng, batch, step):
        if cpu_backend:
            zero = _startup_barrier(params, batch)
            batch = dict(batch, points=batch["points"] + zero)
        bn_momentum = bn_sched(step)

        def loss_fn(p):
            outputs, new_state = model.apply(p, state, rng, batch, True, bn_momentum)
            loss, aux = model.loss(outputs, batch)
            if cfg.weight_decay > 0.0:
                loss = loss + cfg.weight_decay * l2_weight_penalty(p)
            return loss, (new_state, aux)

        (loss, (new_state, _aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_state, new_opt_state, loss

    return train_step


def make_eval_step(model, cfg):
    """Returns eval_step(params, state, batch) -> (loss, cos_ang, outputs').

    Runs the model in inference mode (EMA batch-norm statistics) and
    computes the validation loss plus per-sample angular cosines; for the
    MoE model the argmax expert's cosine is selected on-device
    (parity: `train_n_est_w_experts.py:324-333`)."""

    def eval_step(params, state, batch):
        outputs, _ = model.apply(params, state, None, batch, False, 0.0)
        loss, aux = model.loss(outputs, batch)
        cos_ang = aux["cos_ang"]
        if cos_ang.ndim == 2:  # MoE: [E, B] -> argmax expert per sample
            idx = jnp.argmax(outputs["experts_prob"], axis=0)
            cos_ang = jnp.take_along_axis(cos_ang, idx[None, :], axis=0)[0]
        return loss, cos_ang

    return eval_step


def jit_train_step(train_step):
    """Compile the train step with donated param/state/opt buffers.

    Sharding is established by placement (`place_train_state` /
    `mesh.shard_batch`) and propagated by XLA's SPMD partitioner — the
    batch arrives sharded over "data", so the gradient all-reduce (psum
    over ICI) is inserted automatically."""
    return jax.jit(train_step, donate_argnums=(0, 1, 2))


def jit_eval_step(eval_step):
    return jax.jit(eval_step)


def place_train_state(mesh, params, state, opt_state, *, moe: bool = False):
    """Place params/state/opt_state on the mesh: replicated, except MoE
    expert stacks sharded over the "expert" axis when enabled.
    Optimizer moments follow their parameters' shardings
    (`mesh.opt_state_shardings`) so expert-stack updates stay local to
    the expert shard instead of all-gathering into replicated moments."""
    p_sh = param_shardings(params, mesh, moe=moe)
    s_sh = param_shardings(state, mesh, moe=moe)
    o_sh = opt_state_shardings(opt_state, p_sh, mesh)
    params = jax.tree.map(jax.device_put, params, p_sh)
    state = jax.tree.map(jax.device_put, state, s_sh)
    opt_state = jax.tree.map(jax.device_put, opt_state, o_sh)
    return params, state, opt_state
