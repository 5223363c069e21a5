"""Micro-bisect of the CSR window math + scatter/scan reformulation."""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nestinet_tpu.ops.ball_query import build_grid

B = 1024
T = 896


def timed(jf, args_fn, reps=20):
    _ = np.asarray(jax.tree.leaves(jf(*args_fn(0)))[0])
    t0 = time.perf_counter()
    out = None
    for r in range(reps):
        out = jf(*args_fn(r + 1))
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) * 1000.0 / reps


def main():
    cloud = np.loadtxt("/tmp/benchfix/bench_sphere.xyz").astype(np.float32)
    bbdiag = float(np.linalg.norm(cloud.max(0) - cloud.min(0)))
    rabs = 0.05 * bbdiag
    grid = build_grid(jnp.asarray(cloud), rabs)
    rng = np.random.RandomState(0)
    qs = jnp.asarray(cloud[rng.choice(cloud.shape[0], B)], jnp.float32)
    out = {}

    # shared prefix: cells + dedup + starts/counts (cheap part?)
    def prefix(queries):
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
        return starts, counts

    def s_prefix(queries, s):
        st, ct = prefix(queries)
        return st.sum(1) + ct.sum(1)

    # old lane->segment math on top of the prefix
    def s_old_seg(queries, s):
        starts, counts = prefix(queries)
        cum = jnp.cumsum(counts, axis=1)
        total = cum[:, -1:]
        lane = jnp.arange(T, dtype=jnp.int32)
        seg = jnp.sum(lane[None, :, None] >= cum[:, None, :], axis=-1).astype(jnp.int32)
        seg_c = jnp.minimum(seg, 26)
        prev = jnp.where(
            seg_c > 0,
            jnp.take_along_axis(cum, jnp.maximum(seg_c - 1, 0), axis=1), 0
        )
        cand = jnp.take_along_axis(starts, seg_c, axis=1) + (lane[None] - prev)
        valid = lane[None] < total
        return jnp.where(valid, cand, 0).sum(1) + valid.sum(1)

    # seg-only isolation (the [B, T, 27] compare-reduce)
    def s_seg_only(queries, s):
        starts, counts = prefix(queries)
        cum = jnp.cumsum(counts, axis=1)
        lane = jnp.arange(T, dtype=jnp.int32)
        seg = jnp.sum(lane[None, :, None] >= cum[:, None, :], axis=-1)
        return seg.sum(1)

    # take_along_axis-only isolation
    def s_taa_only(queries, s):
        starts, counts = prefix(queries)
        cum = jnp.cumsum(counts, axis=1)
        segc = jnp.clip(
            (jnp.arange(T, dtype=jnp.int32)[None] * 0
             + (s % jnp.uint32(27)).astype(jnp.int32)), 0, 26
        ) * jnp.ones((B, 1), jnp.int32)
        a = jnp.take_along_axis(starts, segc, axis=1)
        b_ = jnp.take_along_axis(cum, segc, axis=1)
        return a.sum(1) + b_.sum(1)

    # NEW: scatter + cumulative-scan formulation (no [B,T,27], no taa)
    def s_new(queries, s):
        starts, counts = prefix(queries)
        cum = jnp.cumsum(counts, axis=1)  # [B, 27]
        total = cum[:, -1:]
        # segment start positions: p_c = cum[c-1] (p_0 = 0)
        p = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=1)
        live = counts > 0
        # base_c = starts_c - p_c; masked/empty segments scatter -inf so
        # the forward cummax always picks the owning (non-empty) segment
        NEG = jnp.int32(-(2**31) + 1)
        base = jnp.where(live, starts - p, NEG)
        pos = jnp.clip(p, 0, T - 1)
        basef = jnp.full((B, T), NEG, jnp.int32).at[
            jnp.arange(B)[:, None], pos
        ].max(base, mode="drop")
        # ascending cell ids => starts (and starts - p? not monotone!) --
        # use (starts - p) scatter + cummax is invalid if not monotone;
        # guard variant: scatter starts and p separately, both monotone.
        startf = jnp.full((B, T), NEG, jnp.int32).at[
            jnp.arange(B)[:, None], pos
        ].max(jnp.where(live, starts, NEG), mode="drop")
        pf = jnp.full((B, T), NEG, jnp.int32).at[
            jnp.arange(B)[:, None], pos
        ].max(jnp.where(live, p, NEG), mode="drop")
        startf = jax.lax.cummax(startf, axis=1)
        pf = jax.lax.cummax(pf, axis=1)
        lane = jnp.arange(T, dtype=jnp.int32)
        cand = startf + (lane[None] - pf)
        valid = lane[None] < total
        del basef
        return jnp.where(valid, cand, 0).sum(1) + valid.sum(1)

    for name, f in (("prefix", s_prefix), ("old_full", s_old_seg),
                    ("seg_only", s_seg_only), ("taa_only", s_taa_only),
                    ("new_scan", s_new)):
        ms = timed(jax.jit(f), lambda r: (qs, jnp.uint32(r)))
        out[name + "_ms"] = round(ms, 2)

    # correctness: new cand == old cand on real data
    def old_cand(queries):
        starts, counts = prefix(queries)
        cum = jnp.cumsum(counts, axis=1)
        total = cum[:, -1:]
        lane = jnp.arange(T, dtype=jnp.int32)
        seg = jnp.sum(lane[None, :, None] >= cum[:, None, :], axis=-1).astype(jnp.int32)
        seg_c = jnp.minimum(seg, 26)
        prev = jnp.where(
            seg_c > 0,
            jnp.take_along_axis(cum, jnp.maximum(seg_c - 1, 0), axis=1), 0
        )
        cand = jnp.take_along_axis(starts, seg_c, axis=1) + (lane[None] - prev)
        valid = lane[None] < total
        return jnp.where(valid, cand, 0), valid

    def new_cand(queries):
        starts, counts = prefix(queries)
        cum = jnp.cumsum(counts, axis=1)
        total = cum[:, -1:]
        p = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=1)
        live = counts > 0
        NEG = jnp.int32(-(2**31) + 1)
        pos = jnp.clip(p, 0, T - 1)
        startf = jnp.full((B, T), NEG, jnp.int32).at[
            jnp.arange(B)[:, None], pos
        ].max(jnp.where(live, starts, NEG), mode="drop")
        pf = jnp.full((B, T), NEG, jnp.int32).at[
            jnp.arange(B)[:, None], pos
        ].max(jnp.where(live, p, NEG), mode="drop")
        startf = jax.lax.cummax(startf, axis=1)
        pf = jax.lax.cummax(pf, axis=1)
        lane = jnp.arange(T, dtype=jnp.int32)
        cand = startf + (lane[None] - pf)
        valid = lane[None] < total
        return jnp.where(valid, cand, 0), valid

    oc, ov = jax.jit(old_cand)(qs)
    nc_, nv = jax.jit(new_cand)(qs)
    out["cand_match"] = bool(jnp.array_equal(oc, nc_)) and bool(
        jnp.array_equal(ov, nv)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
