"""Where does the on-device extraction's ~24 ms/batch go?

Stages of `ops/ball_query.py` timed separately on the real chip
(fetch-synchronized — see core/profiling.block_sync_reliable), per
radius at the flagship serving shapes (B=256, k=512, 50k-point cloud,
per-radius capacity buckets like infer/device_pipeline._capacity_bucket):

  a. cells:   neighbor-cell ids + searchsorted ranges
  b. gather:  candidate rows -> [B, 27C, 3] points + d2 + hit mask
  c. topk:    hashed-key top_k selection (the uniform draw)
  d. resort:  post-draw ascending row re-sort
  e. full:    extract_patches end to end (gather of selected + center/scale)

Each timing includes one relay dispatch floor (~24-35 ms) which the
empty-program row measures; subtract it for true compute.  A second
section times candidate-window variants (approx_max_k, smaller caps) to
scope optimization headroom before committing to a Pallas kernel.

Usage: python scripts/profile_extraction.py [--points 50000] [--batch 256]
"""

import argparse
import os
import sys
from functools import partial

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nestinet_tpu.core.profiling import block_sync_reliable, timed  # noqa: E402
from nestinet_tpu.ops import ball_query as bq  # noqa: E402


def _capacity_bucket(occ: int) -> int:
    # the round-2 per-cell bucket (min 32, pow2, cap 4096)
    cap = 32
    while cap < occ:
        cap *= 2
    return min(cap, 4096)


def _window_bucket(occ: int) -> int:
    # mirror infer/device_pipeline._capacity_bucket (min 64, pow2, uncapped)
    cap = 64
    while cap < occ:
        cap *= 2
    return cap


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=50_000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args()

    block_sync_reliable()
    rng = np.random.RandomState(0)
    # torus-ish shell: realistic non-uniform cell occupancy
    t = rng.uniform(0, 2 * np.pi, (2, args.points))
    pts = np.stack([
        (0.7 + 0.3 * np.cos(t[1])) * np.cos(t[0]),
        (0.7 + 0.3 * np.cos(t[1])) * np.sin(t[0]),
        0.3 * np.sin(t[1]),
    ], 1).astype(np.float32)
    bbdiag = float(np.linalg.norm(pts.max(0) - pts.min(0)))
    queries = pts[rng.choice(args.points, args.batch, replace=False)]
    q = jnp.asarray(queries)
    seed = jnp.uint32(17)

    empty = jax.jit(lambda x: x + 1.0)
    disp = timed(empty, jnp.zeros((8,), jnp.float32), reps=args.reps)
    print(f"dispatch floor: {disp:.2f} ms")

    total_full = 0.0
    total_csr = 0.0
    for r_frac in (0.01, 0.03, 0.05):
        radius = r_frac * bbdiag
        grid = jax.block_until_ready(bq.build_grid(jnp.asarray(pts), radius))
        cap = _capacity_bucket(bq.max_cell_occupancy(grid))
        n_lanes = 27 * cap
        print(f"\n-- radius {r_frac} (abs {radius:.4f}) cap={cap} "
              f"lanes={n_lanes}")

        @jax.jit
        def stage_cells(grid, q):
            dims = grid.dims
            ijk = jnp.floor((q - grid.origin) / grid.cell_size).astype(jnp.int32)
            offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3),
                                          indexing="ij"), -1).reshape(27, 3)
            ncell = ijk[:, None, :] + offs[None]
            in_b = jnp.all((ncell >= 0) & (ncell < dims[None, None]), -1)
            ncell = jnp.clip(ncell, 0, dims - 1)
            nids = (ncell[..., 0] * dims[1] + ncell[..., 1]) * dims[2] + ncell[..., 2]
            starts = jnp.searchsorted(grid.cell_ids, nids.reshape(-1))
            return starts.reshape(q.shape[0], 27), in_b

        @partial(jax.jit, static_argnames=("cap",))
        def stage_gather(grid, q, radius, cap):
            starts, _ = stage_cells(grid, q)
            lane = jnp.arange(cap, dtype=jnp.int32)
            cand = (starts[..., None] + lane[None, None]).reshape(
                q.shape[0], 27 * cap)
            cpts = grid.points[jnp.clip(cand, 0, grid.points.shape[0] - 1)]
            d2 = jnp.sum(jnp.square(cpts - q[:, None]), -1)
            return d2

        @partial(jax.jit, static_argnames=("k", "cell_capacity"))
        def stage_query(grid, q, radius, seed, k, cell_capacity):
            rows, hit, n_eff = bq._ball_query_sorted(
                grid, q, radius, k=k, cell_capacity=cell_capacity, seed=seed)
            return rows

        @partial(jax.jit, static_argnames=("k", "cell_capacity"))
        def stage_full(grid, q, radius, seed, k, cell_capacity):
            return bq.extract_patches(
                grid, q, radius, k=k, cell_capacity=cell_capacity, seed=seed)

        @partial(jax.jit, static_argnames=("k", "window_capacity"))
        def stage_full_csr(grid, q, radius, seed, k, window_capacity):
            return bq.extract_patches(
                grid, q, radius, k=k, seed=seed,
                window_capacity=window_capacity)

        t_build = timed(lambda p: bq.build_grid(p, radius),
                        jnp.asarray(pts), reps=args.reps)
        t_cells = timed(stage_cells, grid, q, reps=args.reps)
        t_gather = timed(stage_gather, grid, q, radius, cap=cap,
                         reps=args.reps)
        t_query = timed(lambda g, qq: stage_query(
            g, qq, radius, seed, k=args.k, cell_capacity=cap),
            grid, q, reps=args.reps)
        t_full = timed(lambda g, qq: stage_full(
            g, qq, radius, seed, k=args.k, cell_capacity=cap),
            grid, q, reps=args.reps)
        wcap = _window_bucket(bq.max_window_occupancy(grid))
        t_csr = timed(lambda g, qq: stage_full_csr(
            g, qq, radius, seed, k=args.k, window_capacity=wcap),
            grid, q, reps=args.reps)
        total_full += t_full
        total_csr += t_csr
        print(f"build_grid    {t_build:8.2f} ms")
        print(f"cells         {t_cells:8.2f} ms   (+{t_cells - disp:6.2f})")
        print(f"+gather/d2    {t_gather:8.2f} ms   (+{t_gather - t_cells:6.2f})")
        print(f"+topk+resort  {t_query:8.2f} ms   (+{t_query - t_gather:6.2f})")
        print(f"extract full  {t_full:8.2f} ms   (+{t_full - t_query:6.2f})")
        print(f"extract CSR   {t_csr:8.2f} ms   (wcap={wcap}, "
              f"{wcap / n_lanes:.2f}x the per-cell lanes)")

    print(f"\nsum of per-radius extract_full: {total_full:.1f} ms "
          f"(3 dispatches; fused serving pays ~1)")
    print(f"sum of per-radius extract_CSR:  {total_csr:.1f} ms")


if __name__ == "__main__":
    main()
