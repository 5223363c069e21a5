"""Bisect extract_patches internals at B=1024 (real chip).

Stages per radius (g128 caps): window math only, +gather/d2, +selection,
full; plus selection variants (f32-bitcast top_k, re-gather instead of
ride-along take_along_axis).
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nestinet_tpu.ops.ball_query import (
    _candidate_window,
    _mix32,
    _query_select,
    build_grid,
    extract_patches,
)

K = 512
B = 1024


def timed(jf, args_fn, reps=20):
    _ = np.asarray(jax.tree.leaves(jf(*args_fn(0)))[0])
    t0 = time.perf_counter()
    out = None
    for r in range(reps):
        out = jf(*args_fn(r + 1))
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) * 1000.0 / reps


def window_math_only(grid, queries, radius, *, window_capacity):
    """_candidate_window minus the cpts gather and d2 (cand+valid only)."""
    T = int(window_capacity)
    radius = jnp.asarray(radius, jnp.float32)
    queries = queries.astype(jnp.float32)
    dims = grid.dims
    ijk = jnp.floor((queries - grid.origin) / grid.cell_size).astype(jnp.int32)
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"), axis=-1
    ).reshape(27, 3)
    ncell = ijk[:, None, :] + offs[None]
    in_bounds = jnp.all((ncell >= 0) & (ncell < dims[None, None]), axis=-1)
    ncell = jnp.clip(ncell, 0, dims - 1)
    nids = (ncell[..., 0] * dims[1] + ncell[..., 1]) * dims[2] + ncell[..., 2]
    sentinel = -1 - jnp.arange(27, dtype=jnp.int32)
    nids_cmp = jnp.where(in_bounds, nids, sentinel[None])
    eq_earlier = (nids_cmp[:, :, None] == nids_cmp[:, None, :]) & jnp.tril(
        jnp.ones((27, 27), bool), k=-1
    )[None]
    first_visit = ~jnp.any(eq_earlier, axis=-1)
    tbl = grid.cell_starts
    nc = jnp.clip(nids, 0, tbl.shape[0] - 2)
    starts = tbl[nc]
    counts = (tbl[nc + 1] - starts) * (in_bounds & first_visit)
    cum = jnp.cumsum(counts, axis=1)
    total = cum[:, -1:]
    lane = jnp.arange(T, dtype=jnp.int32)
    seg = jnp.sum(lane[None, :, None] >= cum[:, None, :], axis=-1).astype(jnp.int32)
    seg_c = jnp.minimum(seg, 26)
    prev = jnp.where(
        seg_c > 0, jnp.take_along_axis(cum, jnp.maximum(seg_c - 1, 0), axis=1), 0
    )
    cand = jnp.take_along_axis(starts, seg_c, axis=1) + (lane[None] - prev)
    valid = lane[None] < total
    cand = jnp.where(valid, cand, 0)
    return cand, valid


def main():
    cloud = np.loadtxt("/tmp/benchfix/bench_sphere.xyz").astype(np.float32)
    bbdiag = float(np.linalg.norm(cloud.max(0) - cloud.min(0)))
    rng = np.random.RandomState(0)
    qs = jnp.asarray(cloud[rng.choice(cloud.shape[0], B)], jnp.float32)
    out = {"batch": B}

    for rf, cap in ((0.03, 384), (0.05, 896)):
        rabs = rf * bbdiag
        grid = build_grid(jnp.asarray(cloud), rabs)

        def s_winmath(queries, s):
            c, v = window_math_only(grid, queries, rabs, window_capacity=cap)
            return c.sum(1) + v.sum(1)

        def s_window(queries, s):
            c, cp, h, n = _candidate_window(
                grid, queries, rabs, cell_capacity=64, window_capacity=cap
            )
            return cp.sum((1, 2)) + h.sum(1)

        def s_select(queries, s):
            rows, pts, th, ne = _query_select(
                grid, queries, rabs, k=K, cell_capacity=64, seed=s,
                window_capacity=cap,
            )
            return pts.sum((1, 2)) + ne

        def s_full(queries, s):
            p, ne = extract_patches(
                grid, queries, rabs, k=K, window_capacity=cap,
                center="point", seed=s,
            )
            return p.sum((1, 2)) + ne

        for name, f in (("winmath", s_winmath), ("window", s_window),
                        ("select", s_select), ("full", s_full)):
            ms = timed(jax.jit(f), lambda r: (qs, jnp.uint32(r)))
            out[f"r{rf}_{name}_ms"] = round(ms, 2)

        # variant: selection via top_k then RE-GATHER k rows from the
        # cloud instead of take_along_axis over the [B, T, 3] window
        if cap > K:
            def s_regather(queries, s):
                cand, cpts, hit, n_hits = _candidate_window(
                    grid, queries, rabs, cell_capacity=64, window_capacity=cap
                )
                n_eff = jnp.minimum(n_hits, K).astype(jnp.int32)
                q_salt = _mix32(
                    jnp.arange(B, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
                    + s
                )
                h = _mix32(cand.astype(jnp.uint32) ^ q_salt[:, None])
                key = jnp.where(
                    hit, (h >> jnp.uint32(2)).astype(jnp.int32) | 1, 0
                )
                vals, take = jax.lax.top_k(key, K)
                took = vals > 0
                rows = jnp.take_along_axis(cand, take, axis=1)
                pts = grid.points[jnp.where(took, rows, 0)]
                pts = jnp.where(took[:, :, None], pts - queries[:, None], 0.0)
                return (pts / rabs).sum((1, 2)) + n_eff

            def s_f32topk(queries, s):
                cand, cpts, hit, n_hits = _candidate_window(
                    grid, queries, rabs, cell_capacity=64, window_capacity=cap
                )
                n_eff = jnp.minimum(n_hits, K).astype(jnp.int32)
                q_salt = _mix32(
                    jnp.arange(B, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
                    + s
                )
                h = _mix32(cand.astype(jnp.uint32) ^ q_salt[:, None])
                key = jnp.where(
                    hit, (h >> jnp.uint32(2)).astype(jnp.int32) | 1, 0
                )
                fkey = jax.lax.bitcast_convert_type(key, jnp.float32)
                vals, take = jax.lax.top_k(fkey, K)
                took = vals > 0.0
                pts = jnp.take_along_axis(cpts, take[:, :, None], axis=1)
                pts = jnp.where(took[:, :, None], pts - queries[:, None], 0.0)
                return (pts / rabs).sum((1, 2)) + n_eff

            for name, f in (("regather", s_regather), ("f32topk", s_f32topk)):
                ms = timed(jax.jit(f), lambda r: (qs, jnp.uint32(r)))
                out[f"r{rf}_{name}_ms"] = round(ms, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
