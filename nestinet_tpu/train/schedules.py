"""Learning-rate and BN-decay schedules.

Parity with the reference (`train_n_est_w_experts.py:143-162`):
  * lr: staircase exponential decay on EXAMPLES SEEN (step * batch_size),
    clipped below at 1e-6 (`train_n_est.py:120-128`);
  * bn decay: bn_momentum decays 0.5 -> 0 with the same staircase, and
    the EMA decay used is min(0.99, 1 - bn_momentum), i.e. it GROWS
    0.5 -> 0.99 over training.
Both are pure functions of the integer step, usable inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def learning_rate_schedule(cfg):
    base = cfg.learning_rate
    rate = cfg.decay_rate
    decay_step = float(cfg.decay_step)
    batch = float(cfg.batch_size)
    floor = cfg.lr_min

    def schedule(step):
        examples = jnp.asarray(step, jnp.float32) * batch
        lr = base * jnp.power(rate, jnp.floor(examples / decay_step))
        return jnp.maximum(lr, floor)

    return schedule


def bn_momentum_schedule(cfg):
    init = cfg.bn_init_decay
    rate = cfg.bn_decay_rate
    decay_step = float(cfg.decay_step)
    batch = float(cfg.batch_size)
    clip = cfg.bn_decay_clip

    def schedule(step):
        examples = jnp.asarray(step, jnp.float32) * batch
        momentum = init * jnp.power(rate, jnp.floor(examples / decay_step))
        return jnp.minimum(clip, 1.0 - momentum)

    return schedule
