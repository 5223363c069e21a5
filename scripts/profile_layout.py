"""Layout-poisoning experiment (round-2 perf bisection, final step).

Hypothesis from bisect 1+2: standalone rebuilds of the manager and the
vmapped experts are fast (62/133 ms at B=256) while the SAME programs
fed by the jitted `mups()` output are pathological (3.4 s / 25.5 s).
The only difference is the input array: `mups` ends with
`transpose(0,3,1,2).reshape(...)` which XLA folds into the *output
layout* of the mups program; every downstream program compiled against
that layout crawls.

Test: time the manager on
  a. the device-resident mups output            (expect slow if true)
  b. the same values round-tripped through host (expect ~62 ms if true)
  c. the mups output passed through a jitted reshape-copy that forces a
     fresh defaultly-laid-out buffer
and re-measure dense_fwd (one fused program) on an idle relay.

Results append to /tmp/profile_layout.jsonl.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nestinet_tpu.core.config import Config
from nestinet_tpu.models import build_model
from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.ops.mups import mups

B = int(os.environ.get("BISECT_BATCH", "256"))
OUT = "/tmp/profile_layout.jsonl"


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.ravel(leaf)[:8])


def timeit(fn, *args, repeats=5):
    t0 = time.perf_counter()
    _force(fn(*args))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(repeats)]
    for o in outs:
        _force(o)
    total = time.perf_counter() - t0
    return total / repeats * 1e3, warm


def emit(stage, **fields):
    rec = dict(stage=stage, batch=B, **fields)
    print(json.dumps(rec), flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main():
    cfg = Config(
        model="experts_n_est", patch_radius=(0.01, 0.03, 0.05), num_point=512,
        num_gaussians=8, gmm_variance=0.0156, batch_size=B, n_experts=7,
    )
    gmm = get_3d_grid_gmm([8, 8, 8], variance=cfg.gmm_variance)
    model = build_model(cfg, gmm)
    rng = np.random.RandomState(0)
    host_points = rng.uniform(-1, 1, (B, 3 * 512, 3)).astype(np.float32)
    host_neff = np.full((B, 3), 512, np.int32)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params, state = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            {"points": host_points[:4], "n_eff": host_neff[:4]},
        )
        params = jax.block_until_ready(params)
    dev = jax.devices()[0]  # explicit: no-arg device_put is a no-op for
    params = jax.device_put(params, dev)  # CPU-committed arrays
    state = jax.device_put(state, dev)
    jax.block_until_ready((params, state))
    print("params uploaded", file=sys.stderr, flush=True)

    w, mu, sig = (jnp.asarray(v, jnp.float32) for v in gmm.astuple())
    batch = {"points": jnp.asarray(host_points), "n_eff": jnp.asarray(host_neff)}
    jax.block_until_ready(batch)

    gridf = jax.jit(
        lambda p, ne: mups(p, ne, w, mu, sig, n_scales=3, resolution=8,
                           impl=model.mups_impl)
    )
    grid_dev = jax.block_until_ready(gridf(batch["points"], batch["n_eff"]))

    mgr = jax.jit(
        lambda pp, ss, g: model._manager.apply(pp, ss, None, g, False, 0.0)[0]
    )

    # a. device-resident mups output
    ms, warm = timeit(mgr, params["manager"], state["manager"], grid_dev)
    emit("manager_on_mups_output", ms=ms, first_call_s=warm)

    # b. host round trip (fresh default-layout upload of identical values)
    grid_host = jnp.asarray(np.asarray(grid_dev))
    jax.block_until_ready(grid_host)
    ms, warm = timeit(mgr, params["manager"], state["manager"], grid_host)
    emit("manager_on_host_roundtrip", ms=ms, first_call_s=warm)

    # c. on-device relayout copy
    relayout = jax.jit(lambda g: g.reshape(B, -1).reshape(g.shape) + 0.0)
    grid_copy = jax.block_until_ready(relayout(grid_dev))
    ms, warm = timeit(mgr, params["manager"], state["manager"], grid_copy)
    emit("manager_on_device_relayout", ms=ms, first_call_s=warm)

    # d. dense_fwd single fused program, idle-relay re-measurement
    def dense_fwd(pp, ss, bb):
        outputs, _ = model.apply(pp, ss, None, bb, False, 0.0)
        normals = model.predict_normals(outputs)
        experts, probs = model.predict_experts(outputs)
        return jnp.concatenate(
            [normals, experts[:, None].astype(jnp.float32), probs], axis=1
        )
    dense = jax.jit(dense_fwd)
    ms, warm = timeit(dense, params, state, batch)
    emit("dense_fwd", ms=ms, first_call_s=warm,
         implied_patches_per_s=B / (ms / 1e3))


if __name__ == "__main__":
    main()
