"""Device mesh and sharding layout.

The reference is single-process / single-GPU with no collectives
(SURVEY §2.7).  Here scale-out is first-class:
  * a 2D mesh ("data", "expert");
  * the patch batch is sharded over "data" — gradient all-reduce (psum
    over ICI) is inserted automatically by XLA's SPMD partitioner;
  * for the MoE model the stacked expert-group parameter axis can be
    sharded over "expert" (expert parallelism) when the group size is
    divisible; singleton groups stay replicated;
  * multi-host: call `jax.distributed.initialize()` before building the
    mesh and feed each host its own batch shard.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"


def make_mesh(data_parallel: int = 0, expert_parallel: int = 1, devices=None) -> Mesh:
    """Build a (data, expert) mesh.  data_parallel=0 means "use all
    remaining devices along the data axis"."""
    if devices is None:
        devices = jax.devices()
    if data_parallel <= 0:
        data_parallel = len(devices) // expert_parallel
    n = data_parallel * expert_parallel
    grid = np.asarray(devices[:n]).reshape(data_parallel, expert_parallel)
    return Mesh(grid, (DATA_AXIS, EXPERT_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def moe_param_shardings(params, mesh: Mesh):
    """Sharding tree for MoE params: expert-group stacks are sharded on
    their leading axis over the expert mesh axis when divisible,
    everything else is replicated.  Works as a template for jit
    in_shardings/out_shardings."""
    ep = mesh.shape[EXPERT_AXIS]

    def shard_tree(tree, spec):
        return jax.tree.map(lambda _: NamedSharding(mesh, spec), tree)

    out = {}
    for key, sub in params.items():
        if key.startswith("group") and ep > 1:
            leaves = jax.tree.leaves(sub)
            group_size = leaves[0].shape[0] if leaves else 0
            if group_size % ep == 0:
                out[key] = shard_tree(sub, P(EXPERT_AXIS))
                continue
        out[key] = shard_tree(sub, P())
    return out


def param_shardings(params, mesh: Mesh, *, moe: bool = False):
    """Replicated everywhere, except MoE expert stacks when requested."""
    if moe:
        return moe_param_shardings(params, mesh)
    return jax.tree.map(lambda _: replicated(mesh), params)


def opt_state_shardings(opt_state, params_sharding_tree, mesh: Mesh):
    """Sharding tree for an optax state: any sub-tree whose structure
    matches the parameter tree (Adam's mu/nu moments, SGD's momentum
    trace) inherits the parameters' shardings leaf-for-leaf; everything
    else (step counters, schedule state) is replicated.

    Replicating the moments of an expert-sharded stack would waste
    2x the stack's HBM per device AND force the partitioner to
    all-gather the sharded gradients into them each step — matching
    shardings keep the whole update local to the expert shard."""
    rep = replicated(mesh)
    p_struct = jax.tree_util.tree_structure(params_sharding_tree)

    def is_params_like(x):
        try:
            return jax.tree_util.tree_structure(x) == p_struct
        except Exception:
            return False

    def assign(x):
        if is_params_like(x):
            return params_sharding_tree
        return jax.tree.map(lambda _: rep, x)

    return jax.tree.map(assign, opt_state, is_leaf=is_params_like)
