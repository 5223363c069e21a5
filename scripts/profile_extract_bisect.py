"""Bisect the device extraction stage (ball query) on the real chip.

profile_progA measures extraction at ~23 ms/batch (B=256, caps
(64,256,1024)) — half of int8 program A.  This script splits that per
radius and per mechanism:

  per-radius extract     which radius pays (expect the r=0.05 window)
  seeded vs first-k      the uniform-draw hash + re-sort surcharge
  key-only top_k         selection (top_k over T lanes) in isolation
  gather-only            [B, T, 3] candidate gather + d2 in isolation

Timing: K chained dispatches + one fetch (relay rules, docs/PERF.md).

Usage: python scripts/profile_extract_bisect.py [--batch 256]
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
from nestinet_tpu.ops.ball_query import build_grid, extract_patches

RADII_FRAC = (0.01, 0.03, 0.05)
K = 512


def timed(jf, args_fn, reps=20):
    _ = np.asarray(jax.tree.leaves(jf(*args_fn(0)))[0])  # compile
    t0 = time.perf_counter()
    out = None
    for r in range(reps):
        out = jf(*args_fn(r + 1))
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) * 1000.0 / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--data", default="/tmp/bench_r3")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    B = args.batch

    cloud = np.loadtxt(f"{args.data}/bench_sphere.xyz").astype(np.float32)
    bbdiag = float(np.linalg.norm(cloud.max(0) - cloud.min(0)))
    caps = _dataset_window_caps([cloud], RADII_FRAC)
    radii_abs = [r * bbdiag for r in RADII_FRAC]
    grids = [build_grid(jnp.asarray(cloud), r) for r in radii_abs]
    rng = np.random.RandomState(0)
    qs = jnp.asarray(cloud[rng.choice(cloud.shape[0], B)], jnp.float32)

    out = {"batch": B, "caps": list(caps)}

    # -- per-radius extract, seeded and first-k --
    for i, (rf, rabs) in enumerate(zip(RADII_FRAC, radii_abs)):
        for label, seed in (("seeded", True), ("firstk", False)):
            def fn(queries, s, _i=i, _r=rabs, _seeded=seed):
                p, ne = extract_patches(
                    grids[_i], queries, _r, k=K, window_capacity=caps[_i],
                    center="point", seed=(s if _seeded else None),
                )
                return jnp.sum(p, (1, 2)) + ne
            ms = timed(
                jax.jit(fn), lambda r: (qs, jnp.uint32(r)), reps=args.reps
            )
            out[f"r{rf}_{label}_ms"] = round(ms, 2)

    # -- isolation: top_k(k=512) over [B, T] int32 keys --
    for T in sorted({max(c, K) for c in caps}):
        keys = jnp.asarray(
            rng.randint(1, 2**31, size=(B, T), dtype=np.int32)
        )
        def sel(k_, s):
            v, t = jax.lax.top_k(k_ ^ s.astype(jnp.int32), K)
            return v.sum(1) + t.sum(1)
        ms = timed(jax.jit(sel), lambda r: (keys, jnp.uint32(r)), reps=args.reps)
        out[f"topk_{T}_ms"] = round(ms, 2)
        # plus the seeded path's extra row re-sort of [B, K]
        rows = jnp.asarray(
            rng.randint(0, 2**20, size=(B, K), dtype=np.int32)
        )
        def rsort(r_, s):
            return jnp.sort(r_ ^ s.astype(jnp.int32), axis=1).sum(1)
        ms = timed(jax.jit(rsort), lambda r: (rows, jnp.uint32(r)), reps=args.reps)
        out[f"rowsort_{K}_ms"] = round(ms, 2)

    # -- isolation: [B, T, 3] candidate gather + d2 (largest window) --
    Tmax = max(max(caps), K)
    cand = jnp.asarray(
        rng.randint(0, cloud.shape[0], size=(B, Tmax), dtype=np.int32)
    )
    pts_dev = grids[-1].points
    def gath(c_, s):
        cp = pts_dev[(c_ + s.astype(jnp.int32)) % pts_dev.shape[0]]
        d2 = jnp.sum(jnp.square(cp - qs[:, None]), -1)
        return d2.sum(1)
    ms = timed(jax.jit(gath), lambda r: (cand, jnp.uint32(r)), reps=args.reps)
    out[f"gather_d2_{Tmax}_ms"] = round(ms, 2)

    # -- isolation: final [B, K] patch-point gather (x3 in real program)
    rows = jnp.asarray(
        rng.randint(0, cloud.shape[0], size=(B, K), dtype=np.int32)
    )
    def pgath(r_, s):
        return pts_dev[(r_ + s.astype(jnp.int32)) % pts_dev.shape[0]].sum((1, 2))
    ms = timed(jax.jit(pgath), lambda r: (rows, jnp.uint32(r)), reps=args.reps)
    out[f"patch_gather_{K}_ms"] = round(ms, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
