"""True device cost of the sparse-serving programs (A and B).

Measures each program by dispatching it `reps` times back-to-back and
synchronizing ONCE via a device->host fetch at the end — the only
reliable sync on the axon relay (block_until_ready returns early).
Per-dispatch cost = (total - one RTT) / reps.

Usage: python scripts/profile_sparse_programs.py log/moe_synth
           [--batch 256] [--dtype bfloat16] [--reps 20]
"""

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nestinet_tpu.infer.device_pipeline import (  # noqa: E402
    _capacity_bucket,
    make_device_manager_store,
)
from nestinet_tpu.infer.predict import (  # noqa: E402
    _expert_on_buf,
    load_run,
    restore_model,
)
from nestinet_tpu.ops.ball_query import (  # noqa: E402
    build_grid,
    max_cell_occupancy,
)


def sync():
    # one tiny round trip
    np.asarray(jnp.zeros((1,)) + 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--n_cloud", type=int, default=50_000)
    args = ap.parse_args()
    B = args.batch

    rd, cfg, gmm, model = load_run(args.run_dir, compute_dtype=args.dtype)
    sample = {
        "points": np.zeros((B, cfg.n_scales * cfg.num_point, 3), np.float32),
        "n_eff": np.full((B, cfg.n_scales), cfg.num_point, np.int32),
    }
    params, state = restore_model(rd, cfg, model, sample)

    rng = np.random.RandomState(0)
    cloud = rng.randn(args.n_cloud, 3).astype(np.float32)
    cloud /= np.abs(cloud).max()
    bbdiag = float(np.linalg.norm(cloud.max(0) - cloud.min(0)))
    radii_abs = [r * bbdiag for r in cfg.patch_radius]
    cloud_dev = jnp.asarray(cloud)
    grids = [build_grid(cloud_dev, r) for r in radii_abs]
    occ = max(max_cell_occupancy(g) for g in grids)
    cap = _capacity_bucket(occ)
    print(f"occupancy {occ} -> capacity {cap}")
    radii_dev = jnp.asarray(radii_abs, jnp.float32)
    queries = jnp.asarray(cloud[:B])

    res = model.resolution
    W = max(2, 8192 // B)
    buf = jnp.zeros((W, B, res, res, res, 20 * cfg.n_scales),
                    model.compute_dtype)
    buf = jax.device_put(buf)

    mgr = make_device_manager_store(
        model, cfg.n_scales, num_point=cfg.num_point, cell_capacity=cap
    )

    def rtt():
        t0 = time.perf_counter()
        sync()
        return time.perf_counter() - t0

    # warm up compile
    probs, buf2 = mgr(params, state, grids, queries, radii_dev, buf, jnp.asarray(0, jnp.int32))
    np.asarray(probs)
    buf = buf2

    sync()
    base = min(rtt() for _ in range(5))
    print(f"rtt floor: {base*1e3:.1f} ms")

    # ---- program A: extraction + MuPS + manager + park ----
    t0 = time.perf_counter()
    for i in range(args.reps):
        probs, buf = mgr(params, state, grids, queries, radii_dev, buf,
                         jnp.asarray(i % W, jnp.int32))
    np.asarray(probs)
    tot = time.perf_counter() - t0
    print(f"program A (extract+MuPS+mgr+park): {(tot-base)/args.reps*1e3:.1f} ms/dispatch")

    # ---- variant: MuPS + manager on UPLOADED patches (host path A) ----
    def manager_store_host(params, state, batch, buf, slot):
        grid = model._mups_grid(batch["points"], batch["n_eff"]).astype(
            model.compute_dtype
        )
        probs = model.apply_manager_on_grid(params, state, grid)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, grid[None], slot, axis=0)
        return probs, buf

    mgr_h = jax.jit(manager_store_host, donate_argnums=(3,))
    batch = {
        "points": jnp.asarray(
            rng.uniform(-1, 1, (B, cfg.n_scales * cfg.num_point, 3)).astype(
                np.float32
            )
        ),
        "n_eff": jnp.asarray(
            np.full((B, cfg.n_scales), cfg.num_point, np.int32)
        ),
    }
    probs, buf = mgr_h(params, state, batch, buf, jnp.asarray(0, jnp.int32))
    np.asarray(probs)
    t0 = time.perf_counter()
    for i in range(args.reps):
        probs, buf = mgr_h(params, state, batch, buf, jnp.asarray(i % W, jnp.int32))
    np.asarray(probs)
    tot = time.perf_counter() - t0
    print(f"program A-host (MuPS+mgr+park):    {(tot-base)/args.reps*1e3:.1f} ms/dispatch")

    # ---- extraction alone ----
    from nestinet_tpu.ops.ball_query import extract_patches

    def extract_only(grids, queries, radii):
        outs = []
        for i in range(cfg.n_scales):
            p, ne = extract_patches(grids[i], queries, radii[i],
                                    k=cfg.num_point, cell_capacity=cap,
                                    center="point")
            outs.append(p.sum())
        return sum(outs)

    ex = jax.jit(extract_only)
    np.asarray(ex(grids, queries, radii_dev))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = ex(grids, queries, radii_dev)
    np.asarray(out)
    tot = time.perf_counter() - t0
    print(f"extraction only (3 radii):         {(tot-base)/args.reps*1e3:.1f} ms/dispatch")

    # ---- program B per group ----
    flat_idx = jnp.asarray(rng.randint(0, W * B, B).astype(np.int32))
    for gi, group in enumerate(model.groups):
        fn = jax.jit(functools.partial(_expert_on_buf, model, group_index=gi))
        member = jnp.asarray(0, jnp.int32)
        np.asarray(fn(params, state, buf, flat_idx, member=member))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(params, state, buf, flat_idx, member=member)
        np.asarray(out)
        tot = time.perf_counter() - t0
        print(f"program B group{gi} (gather+expert): {(tot-base)/args.reps*1e3:.1f} ms/dispatch")

    # ---- MuPS alone (model impl) on patches ----
    def mups_only(points, n_eff):
        return model._mups_grid(points, n_eff).astype(model.compute_dtype).sum()

    mo = jax.jit(mups_only)
    np.asarray(mo(batch["points"], batch["n_eff"]))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = mo(batch["points"], batch["n_eff"])
    np.asarray(out)
    tot = time.perf_counter() - t0
    print(f"MuPS alone ({model.mups_impl}):            {(tot-base)/args.reps*1e3:.1f} ms/dispatch")


if __name__ == "__main__":
    main()
