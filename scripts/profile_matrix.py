"""Controlled perf matrix for the 60x manager anomaly.

Earlier bisects measured the standalone manager rebuild at 62 ms but
model._manager at 3.4-4.3 s for identical math at B=256 — in DIFFERENT
processes at different times, so relay health is a confound.  This runs
every cell in ONE process, interleaved with a matmul health control:

  ctrl_matmul            relay health floor (1024^3 matmul chain)
  standalone_tpu_rand    bisect2 rebuild: TPU-init params, random grid
  standalone_cpu_rand    same module, CPU-init + device_put params
  model_tpu_rand         model._manager, TPU-init params, random grid
  model_cpu_rand         model._manager, CPU-init params, random grid
  model_cpu_mups         model._manager, CPU-init params, mups grid
  ctrl_matmul_end        relay health re-check

Isolates {param source} x {grid source} x {module build} under one
relay state.  Results append to /tmp/profile_matrix.jsonl.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import haiku as hk
import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nestinet_tpu.core.config import Config
from nestinet_tpu.models import backbones, build_model
from nestinet_tpu.models.base import fc_head
from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.ops.mups import mups
from nestinet_tpu.ops.nn import run_backbone

B = int(os.environ.get("BISECT_BATCH", "256"))
OUT = "/tmp/profile_matrix.jsonl"


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.ravel(leaf)[:8])


def timeit(fn, *args, repeats=3):
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


def matmul_ctrl(tag):
    x = jnp.ones((1024, 1024), jnp.float32)

    def chain(a):
        for _ in range(8):
            a = a @ a / 33.0
        return a

    ms, warm = timeit(jax.jit(chain), x)
    emit(tag, ms=ms, first_call_s=warm, gflop=8 * 2 * 1024**3 / 1e9)


def main():
    rng = np.random.RandomState(0)
    rand_grid = jnp.asarray(rng.randn(B, 8, 8, 8, 60).astype(np.float32))
    jax.block_until_ready(rand_grid)

    matmul_ctrl("ctrl_matmul")

    # ---- standalone rebuild (bisect2's bb_full_softmax) ----
    spec = backbones.CONV_NET_8G

    def standalone_fn(x):
        feat = run_backbone(x, spec, False, 0.0)
        logits = fc_head(feat, (1024, 256, 128), 7, is_training=False,
                         bn_momentum=0.0, final_activation=jax.nn.relu)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.transpose(probs)

    t = hk.transform_with_state(standalone_fn)
    p_tpu, s_tpu = t.init(jax.random.PRNGKey(0), rand_grid)
    app = jax.jit(lambda p, s, x: t.apply(p, s, None, x)[0])
    ms, warm = timeit(app, p_tpu, s_tpu, rand_grid)
    emit("standalone_tpu_rand", ms=ms, first_call_s=warm)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        p_cpu, s_cpu = t.init(jax.random.PRNGKey(0), np.asarray(rand_grid[:4]))
    p_cpu = jax.device_put(jax.block_until_ready(p_cpu), jax.devices()[0])
    s_cpu = jax.device_put(jax.block_until_ready(s_cpu), jax.devices()[0])
    jax.block_until_ready((p_cpu, s_cpu))
    ms, warm = timeit(app, p_cpu, s_cpu, rand_grid)
    emit("standalone_cpu_rand", ms=ms, first_call_s=warm)

    matmul_ctrl("ctrl_matmul_mid")

    # ---- the model's own manager ----
    cfg = Config(
        model="experts_n_est", patch_radius=(0.01, 0.03, 0.05), num_point=512,
        num_gaussians=8, gmm_variance=0.0156, batch_size=B, n_experts=7,
    )
    gmm = get_3d_grid_gmm([8, 8, 8], variance=cfg.gmm_variance)
    model = build_model(cfg, gmm)
    mgr = jax.jit(
        lambda pp, ss, g: model._manager.apply(pp, ss, None, g, False, 0.0)[0]
    )

    pm_tpu, sm_tpu = model._manager.init(jax.random.PRNGKey(0), rand_grid, True, 0.5)
    ms, warm = timeit(mgr, pm_tpu, sm_tpu, rand_grid)
    emit("model_tpu_rand", ms=ms, first_call_s=warm)

    host_points = rng.uniform(-1, 1, (B, 3 * 512, 3)).astype(np.float32)
    host_neff = np.full((B, 3), 512, np.int32)
    with jax.default_device(cpu):
        pm_cpu, sm_cpu = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            {"points": host_points[:4], "n_eff": host_neff[:4]},
        )
        pm_cpu = jax.block_until_ready(pm_cpu)
    pm_cpu = jax.device_put(pm_cpu["manager"], jax.devices()[0])
    sm_cpu = jax.device_put(sm_cpu["manager"], jax.devices()[0])
    jax.block_until_ready((pm_cpu, sm_cpu))
    ms, warm = timeit(mgr, pm_cpu, sm_cpu, rand_grid)
    emit("model_cpu_rand", ms=ms, first_call_s=warm)

    w, mu, sig = (jnp.asarray(v, jnp.float32) for v in gmm.astuple())
    gridf = jax.jit(
        lambda p, ne: mups(p, ne, w, mu, sig, n_scales=3, resolution=8,
                           impl=model.mups_impl)
    )
    grid_m = jax.block_until_ready(
        gridf(jnp.asarray(host_points), jnp.asarray(host_neff))
    )
    ms, warm = timeit(mgr, pm_cpu, sm_cpu, grid_m)
    emit("model_cpu_mups", ms=ms, first_call_s=warm)

    matmul_ctrl("ctrl_matmul_end")


if __name__ == "__main__":
    main()
