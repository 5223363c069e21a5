"""Subprocess body for test_moe_train_step_multidevice.

Runs one reduced-flagship MoE train step + eval step over a
(2 data x 2 expert) virtual CPU mesh and prints "MOE_MULTIDEVICE_OK"
on success.  Run in a FRESH process (see the test for why: XLA:CPU's
in-process collectives abort the whole process via a hard-coded 40 s
rendezvous termination when partitions starve, so the check must be
isolated from the rest of the suite both for reliability and so an
abort cannot kill pytest itself).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from nestinet_tpu.core.config import Config  # noqa: E402
from nestinet_tpu.models import build_model  # noqa: E402
from nestinet_tpu.ops.gmm import get_3d_grid_gmm  # noqa: E402
from nestinet_tpu.train.mesh import make_mesh, shard_batch  # noqa: E402
from nestinet_tpu.train.train_step import (  # noqa: E402
    jit_train_step,
    make_eval_step,
    make_optimizer,
    make_train_step,
    place_train_state,
)


def main():
    rng = np.random.RandomState(0)
    devices = jax.devices()[:4]
    assert len(devices) == 4, "expected >=4 virtual devices"

    # 2x2 (data x expert) mesh: the composite sharding semantics under
    # test are identical to larger meshes, and 4 timesharing partitions
    # keep collective-arrival stagger inside XLA:CPU's hard-coded 40 s
    # rendezvous window on 1-core hosts (8 partitions are borderline).
    cfg = Config(
        model="experts_n_est",
        patch_radius=(0.1, 0.3),
        num_point=4,
        num_gaussians=3,
        gmm_variance=0.111,
        batch_size=4,
        n_experts=4,
        expert_dict={i: [i % 2] for i in range(4)},
        data_parallel=2,
        expert_parallel=2,
    )
    gmm = get_3d_grid_gmm([3, 3, 3], variance=cfg.gmm_variance)
    model = build_model(cfg, gmm)
    mesh = make_mesh(cfg.data_parallel, cfg.expert_parallel, devices=devices)

    batch_np = {
        "points": rng.uniform(-1, 1, size=(4, 2 * 4, 3)).astype(np.float32),
        "n_eff": np.full((4, 2), 4, dtype=np.int32),
        "normals": rng.randn(4, 3).astype(np.float32),
    }

    params, state = model.init_jitted(jax.random.PRNGKey(0), batch_np)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    params, state, opt_state = place_train_state(
        mesh, params, state, opt_state, moe=True
    )

    # the 4-expert group must actually be sharded over the expert axis
    leaf = jax.tree.leaves(params["group0"])[0]
    assert not leaf.sharding.is_fully_replicated, "expert stack not EP-sharded"

    step_fn = jit_train_step(make_train_step(model, cfg, tx))
    sharded_batch = shard_batch(batch_np, mesh)
    old_params = jax.tree.map(lambda x: np.asarray(x), params)
    params, state, opt_state, loss = step_fn(
        params, state, opt_state, jax.random.PRNGKey(1), sharded_batch,
        jnp.asarray(0, jnp.int32),
    )
    assert np.isfinite(float(loss)), f"non-finite loss {float(loss)}"
    new_leaf = np.asarray(jax.tree.leaves(params)[0])
    old_leaf = np.asarray(jax.tree.leaves(old_params)[0])
    assert not np.allclose(new_leaf, old_leaf), "params did not update"

    # eval step runs under the same mesh
    eval_fn = jax.jit(make_eval_step(model, cfg))
    loss_e, cos = eval_fn(params, state, sharded_batch)
    assert np.isfinite(float(loss_e))
    assert cos.shape == (4,)
    print("MOE_MULTIDEVICE_OK")


if __name__ == "__main__":
    main()
