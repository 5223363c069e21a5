"""Stage split of serving program A (device extraction + MuPS + manager).

The sparse device pipeline is device-throughput-bound on program A
(probs_materialize ~= program-A device time once the DEPTH-deep fetch
pipeline hides the relay RTT — profile_modes traces).  This script
measures where that time goes, with the relay's timing rules respected:

  * only a device->host fetch synchronizes (block_until_ready returns
    immediately on the axon backend — docs/PERF.md "Measurement rules");
  * per-stage DEVICE time is measured throughput-style: K chained
    dispatches then ONE fetch, so wall ~= K * device_time + 1 RTT, and
    the dispatch/RTT floor is amortized away instead of subtracted.

Stages (cumulative prefixes of program A, all jitted standalone):
  extract    3-radius ball-query patch extraction (CSR windows)
  mups       extract + 3DmFV statistics grid
  managerA   extract + MuPS + manager CNN probs (program A sans park)

Usage: python scripts/profile_progA.py log/moe_synth60 \
           [--data /tmp/bench_r3] [--batch 256] [--dtypes bfloat16,int8]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nestinet_tpu.infer.device_pipeline import _dataset_window_caps
from nestinet_tpu.infer.predict import load_run, restore_model
from nestinet_tpu.ops.ball_query import build_grid, extract_patches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--data", default="/tmp/bench_r3")
    ap.add_argument("--cloud", default="bench_sphere")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--dtypes", default="bfloat16,int8")
    args = ap.parse_args()

    cloud = np.loadtxt(f"{args.data}/{args.cloud}.xyz").astype(np.float32)
    bbdiag = float(np.linalg.norm(cloud.max(0) - cloud.min(0)))

    for dtype in args.dtypes.split(","):
        rd, cfg, gmm, model = load_run(args.run_dir, compute_dtype=dtype)
        n_scales = len(cfg.patch_radius)
        caps = _dataset_window_caps([cloud], cfg.patch_radius)
        radii_abs = [r * bbdiag for r in cfg.patch_radius]

        sample = {
            "points": np.zeros(
                (args.batch, n_scales * cfg.num_point, 3), np.float32
            ),
            "n_eff": np.full((args.batch, n_scales), cfg.num_point, np.int32),
        }
        params, state = restore_model(rd, cfg, model, sample)
        grids = [build_grid(jnp.asarray(cloud), r) for r in radii_abs]
        radii_dev = jnp.asarray(radii_abs, jnp.float32)
        rng = np.random.RandomState(0)
        qs = jnp.asarray(
            cloud[rng.choice(cloud.shape[0], args.batch)], jnp.float32
        )

        def _extract(queries, seed):
            pts, neff = [], []
            for i in range(n_scales):
                p, ne = extract_patches(
                    grids[i], queries, radii_dev[i], k=cfg.num_point,
                    window_capacity=caps[i], center="point",
                    seed=seed + jnp.uint32(0x85EBCA6B) * jnp.uint32(i),
                )
                pts.append(p)
                neff.append(ne)
            return jnp.concatenate(pts, 1), jnp.stack(neff, 1)

        def stage_extract(queries, seed):
            pts, neff = _extract(queries, seed)
            return jnp.sum(pts, axis=(1, 2)) + neff.sum(1)  # [B] forcing value

        def stage_mups(queries, seed):
            pts, neff = _extract(queries, seed)
            grid = model._mups_grid(pts, neff).astype(model.compute_dtype)
            return jnp.sum(grid, axis=(1, 2, 3, 4))  # [B]

        def stage_managerA(queries, seed):
            pts, neff = _extract(queries, seed)
            grid = model._mups_grid(pts, neff).astype(model.compute_dtype)
            probs = model.apply_manager_on_grid(params, state, grid)
            return probs.sum(0)  # [B]

        results = {}
        for name, fn in (
            ("extract", stage_extract),
            ("mups", stage_mups),
            ("managerA", stage_managerA),
        ):
            jf = jax.jit(fn)
            _ = np.asarray(jf(qs, jnp.uint32(1)))  # compile + settle
            t0 = time.perf_counter()
            out = None
            for r in range(args.reps):  # chained dispatches, one fetch
                out = jf(qs, jnp.uint32(2 + r))
            _ = np.asarray(out)
            wall = time.perf_counter() - t0
            results[name] = wall * 1000.0 / args.reps
        # one empty-ish program for the dispatch+RTT floor (single call)
        tiny = jax.jit(lambda s: s + 1)
        _ = np.asarray(tiny(jnp.uint32(3)))
        t0 = time.perf_counter()
        _ = np.asarray(tiny(jnp.uint32(4)))
        floor_ms = (time.perf_counter() - t0) * 1000.0

        print(json.dumps({
            "dtype": dtype,
            "batch": args.batch,
            "reps": args.reps,
            "window_caps": list(caps),
            "ms_per_call": {k: round(v, 2) for k, v in results.items()},
            "deltas_ms": {
                "extract": round(results["extract"], 2),
                "mups": round(results["mups"] - results["extract"], 2),
                "manager": round(results["managerA"] - results["mups"], 2),
            },
            "fetch_floor_ms_single": round(floor_ms, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
