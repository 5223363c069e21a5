"""B=1024 extraction probe: cap granularity + top_k variants (real chip)."""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from nestinet_tpu.ops.ball_query import build_grid, extract_patches

RADII_FRAC = (0.01, 0.03, 0.05)
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


def main():
    clouds = [
        np.loadtxt(f"/tmp/benchfix/{n}.xyz").astype(np.float32)
        for n in ("bench_sphere", "bench_torus")
    ]
    cloud = clouds[0]
    bbdiag = float(np.linalg.norm(cloud.max(0) - cloud.min(0)))
    radii_abs = [r * bbdiag for r in RADII_FRAC]
    grids = [build_grid(jnp.asarray(cloud), r) for r in radii_abs]
    rng = np.random.RandomState(0)
    qs = jnp.asarray(cloud[rng.choice(cloud.shape[0], B)], jnp.float32)

    out = {"batch": B}

    # per-radius extract under old pow2 caps vs 128-granularity caps
    for caps, tag in (((64, 512, 1024), "pow2"), ((64, 384, 896), "g128")):
        total = 0.0
        for i, rabs in enumerate(radii_abs):
            def fn(queries, s, _i=i, _r=rabs, _c=caps[i]):
                p, ne = extract_patches(
                    grids[_i], queries, _r, k=K, window_capacity=_c,
                    center="point", seed=s,
                )
                return jnp.sum(p, (1, 2)) + ne
            ms = timed(jax.jit(fn), lambda r: (qs, jnp.uint32(r)))
            out[f"extract_{tag}_r{i}_ms"] = round(ms, 2)
            total += ms
        out[f"extract_{tag}_total_ms"] = round(total, 2)

    # fused 3-radius extraction (as in program A) old vs new caps
    for caps, tag in (((64, 512, 1024), "pow2"), ((64, 384, 896), "g128")):
        def fused(queries, s, _caps=caps):
            acc = []
            for i, rabs in enumerate(radii_abs):
                p, ne = extract_patches(
                    grids[i], queries, rabs, k=K, window_capacity=_caps[i],
                    center="point", seed=s + jnp.uint32(0x85EBCA6B) * jnp.uint32(i),
                )
                acc.append(jnp.sum(p, (1, 2)) + ne)
            return sum(acc)
        ms = timed(jax.jit(fused), lambda r: (qs, jnp.uint32(r)))
        out[f"fused_{tag}_ms"] = round(ms, 2)

    # top_k variants over [B, T] uniform int32 keys
    for T in (896, 1024):
        keys = jnp.asarray(rng.randint(1, 2**30, size=(B, T), dtype=np.int32))

        def tk_int(k_, s):
            v, t = jax.lax.top_k(k_ ^ (s >> jnp.uint32(1)).astype(jnp.int32), K)
            return v.sum(1) + t.sum(1)

        def tk_f32(k_, s):
            kk = k_ ^ (s >> jnp.uint32(1)).astype(jnp.int32)
            v, t = jax.lax.top_k(jax.lax.bitcast_convert_type(kk, jnp.float32), K)
            return t.sum(1)

        def tk_approx(k_, s):
            kk = k_ ^ (s >> jnp.uint32(1)).astype(jnp.int32)
            v, t = jax.lax.approx_max_k(
                kk.astype(jnp.float32), K, recall_target=0.99,
                aggregate_to_topk=True,
            )
            return t.sum(1)

        for name, f in (("int32", tk_int), ("f32bitcast", tk_f32),
                        ("approx99", tk_approx)):
            try:
                ms = timed(jax.jit(f), lambda r: (keys, jnp.uint32(r)))
                out[f"topk_{name}_{T}_ms"] = round(ms, 2)
            except Exception as e:
                out[f"topk_{name}_{T}_ms"] = f"FAIL {type(e).__name__}"

    # compaction-path sort [B, T] for T<=k (r2 under new caps)
    for T in (384, 512):
        ordv = jnp.asarray(rng.randint(0, 2 * T, size=(B, T), dtype=np.int32))
        def srt(o_, s):
            return jnp.sort(o_ ^ (s % jnp.uint32(2)).astype(jnp.int32), axis=1).sum(1)
        ms = timed(jax.jit(srt), lambda r: (ordv, jnp.uint32(r)))
        out[f"sortT_{T}_ms"] = round(ms, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
