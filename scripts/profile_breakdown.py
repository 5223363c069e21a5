"""Component-level timing of flagship MoE inference on the real chip.

Answers VERDICT #3: where does the per-batch serving time go?  Times
each stage of the compiled path separately (median of repeats, with
block_until_ready), at the bench batch size:

  upload        host->device transfer of one batch of patches
  mups_pallas   fused Pallas 3DmFV kernel (points -> [B,8,8,8,60] grid)
  mups_jnp      XLA broadcast-reduce variant of the same
  manager       manager CNN on a precomputed grid
  expert_g0     one single-scale expert CNN on a precomputed grid slice
  dense_fwd     full dense program (MuPS + manager + all experts + pack)
  fetch         device->host of the packed [B, 4+E] result

Usage: python scripts/profile_breakdown.py [--batch 256] [--dtype float32]
"""

import argparse
import os
import statistics
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

NUM_POINT = 512
RADII = (0.01, 0.03, 0.05)


def timeit(fn, *args, repeats=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--repeats", type=int, default=10)
    args = ap.parse_args()
    B = args.batch

    cfg = Config(
        model="experts_n_est", patch_radius=RADII, num_point=NUM_POINT,
        num_gaussians=8, gmm_variance=0.0156, batch_size=B, n_experts=7,
        compute_dtype=args.dtype,
    )
    gmm = get_3d_grid_gmm([8, 8, 8], variance=cfg.gmm_variance)
    model = build_model(cfg, gmm)
    rng = np.random.RandomState(0)
    host_points = rng.uniform(-1, 1, (B, 3 * NUM_POINT, 3)).astype(np.float32)
    host_neff = np.full((B, 3), NUM_POINT, np.int32)
    batch = {"points": jnp.asarray(host_points), "n_eff": jnp.asarray(host_neff)}

    t0 = time.perf_counter()
    params, state = model.init_jitted(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(params)
    print(f"init: {time.perf_counter()-t0:.1f}s", flush=True)

    results = {}

    # upload
    def upload():
        a = jax.device_put(host_points)
        b = jax.device_put(host_neff)
        return a, b
    results["upload"] = timeit(upload, repeats=args.repeats)

    w, mu, sig = (jnp.asarray(v, jnp.float32) for v in gmm.astuple())

    for impl in ("pallas", "jnp"):
        if impl == "pallas" and jax.default_backend() != "tpu":
            continue
        f = jax.jit(
            lambda p, ne, impl=impl: mups(
                p, ne, w, mu, sig, n_scales=3, resolution=8, impl=impl
            )
        )
        results[f"mups_{impl}"] = timeit(f, batch["points"], batch["n_eff"],
                                         repeats=args.repeats)

    grid = jax.jit(
        lambda p, ne: mups(p, ne, w, mu, sig, n_scales=3, resolution=8,
                           impl=model.mups_impl).astype(model.compute_dtype)
    )(batch["points"], batch["n_eff"])
    jax.block_until_ready(grid)

    mgr = jax.jit(
        lambda pp, ss, g: model._manager.apply(pp, ss, None, g, False, 0.0)[0]
    )
    results["manager"] = timeit(mgr, params["manager"], state["manager"], grid,
                                repeats=args.repeats)

    g0 = model.groups[0]
    fwd0 = model._expert_fwd[g0.n_scales]
    pick = lambda a: a[0]
    p0 = jax.tree.map(pick, params["group0"])
    s0 = jax.tree.map(pick, state["group0"])
    x0 = grid[..., : g0.channels]
    e0 = jax.jit(lambda pp, ss, x: fwd0.apply(pp, ss, None, x, False, 0.0)[0])
    results["expert_g0"] = timeit(e0, p0, s0, x0, repeats=args.repeats)

    # all experts via the model's grouped vmap path, on a precomputed grid
    def experts_only(pp, ss, g):
        outs = []
        for gi, group in enumerate(model.groups):
            fwd = model._expert_fwd[group.n_scales]
            xs = model._group_inputs(g, group)

            def one(p, s, x, _fwd=fwd):
                return _fwd.apply(p, s, None, x, False, 0.0)

            o, _ = jax.vmap(one)(pp[f"group{gi}"], ss[f"group{gi}"], xs)
            outs.append(o)
        return jnp.concatenate(outs, 0)
    results["experts_all"] = timeit(jax.jit(experts_only), params, state, grid,
                                    repeats=args.repeats)

    def dense_fwd(pp, ss, bb):
        outputs, _ = model.apply(pp, ss, None, bb, False, 0.0)
        normals = model.predict_normals(outputs)
        experts, probs = model.predict_experts(outputs)
        return jnp.concatenate(
            [normals, experts[:, None].astype(jnp.float32), probs], axis=1
        )
    dense = jax.jit(dense_fwd)
    results["dense_fwd"] = timeit(dense, params, state, batch,
                                  repeats=args.repeats)

    out = dense(params, state, batch)
    jax.block_until_ready(out)

    def fetch():
        return np.asarray(out)
    results["fetch"] = timeit(fetch, repeats=args.repeats)

    # dispatch floor: trivial program round trip
    triv = jax.jit(lambda x: x + 1.0)
    small = jnp.zeros((8,), jnp.float32)
    results["dispatch_floor"] = timeit(triv, small, repeats=args.repeats)

    print(f"\nbatch={B} dtype={args.dtype} backend={jax.default_backend()}")
    for k, v in results.items():
        per_patch = v / B * 1e3
        print(f"  {k:16s} {v:9.2f} ms   ({per_patch:8.1f} us/patch)")
    print(f"  implied dense-only rate: {B / (results['dense_fwd'] / 1e3):.0f} patches/s")


if __name__ == "__main__":
    main()
