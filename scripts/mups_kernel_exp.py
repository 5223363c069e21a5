"""Experiment: patch-blocked MuPS Pallas kernel vs the shipped 1-patch-
per-program kernel.  Validates numerics against the jnp reference and
times BLOCK_B variants on the real chip.

Usage: python scripts/mups_kernel_exp.py --batch 256 --blocks 1,2,4,8
"""

import argparse
import functools
import math
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.ops.mups import tdmfv_n_est

_EPS = 1e-12


def _kernel_blocked(n_eff_ref, pts_ref, mu_ref, sigma_ref, w_ref, out_ref,
                    *, block_b: int):
    bb = pl.program_id(0)
    mu = mu_ref[:]
    sigma = sigma_ref[:]
    w = w_ref[:]
    k = mu.shape[1]
    inv_sigma = 1.0 / sigma
    sig0 = sigma[0:1, :]
    coef = (1.0 / math.pow(2.0 * math.pi, 1.5)) / (sig0 * sig0 * sig0)
    rsqrt_w = jax.lax.rsqrt(w)
    scale_rows = jnp.concatenate(
        [
            jnp.ones((2, k), jnp.float32),
            jnp.tile(rsqrt_w, (9, 1)),
            jnp.tile(jax.lax.rsqrt(2.0 * w), (9, 1)),
        ],
        axis=0,
    )

    for j in range(block_b):
        n_eff = n_eff_ref[bb * block_b + j]
        pts = pts_ref[j]  # [N, 3]
        n = pts.shape[0]

        scaled0 = (pts[:, 0:1] - mu[0:1, :]) * inv_sigma[0:1, :]
        scaled1 = (pts[:, 1:2] - mu[1:2, :]) * inv_sigma[1:2, :]
        scaled2 = (pts[:, 2:3] - mu[2:3, :]) * inv_sigma[2:3, :]
        dist2 = scaled0 * scaled0 + scaled1 * scaled1 + scaled2 * scaled2
        p = coef * jnp.exp(-0.5 * dist2)
        wp = p * w
        q = wp / jnp.sum(wp, axis=1, keepdims=True)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)
        real = rows <= n_eff
        q = jnp.where(real, q, 0.0)
        d_pi_all = jnp.where(real, (q - w) * rsqrt_w, 0.0)
        eff = jnp.maximum(n_eff, 1).astype(jnp.float32)
        inv_eff = 1.0 / eff

        chans = [jnp.max(d_pi_all, axis=0), jnp.sum(d_pi_all, axis=0)]
        for sd in (scaled0, scaled1, scaled2):
            chans.append(jnp.max(q * sd, axis=0))
        for sd in (scaled0, scaled1, scaled2):
            chans.append(jnp.min(q * sd, axis=0))
        for sd in (scaled0, scaled1, scaled2):
            chans.append(jnp.sum(q * sd, axis=0))
        for sd in (scaled0, scaled1, scaled2):
            chans.append(jnp.max(q * (sd * sd - 1.0), axis=0))
        for sd in (scaled0, scaled1, scaled2):
            chans.append(jnp.min(q * (sd * sd - 1.0), axis=0))
        for sd in (scaled0, scaled1, scaled2):
            chans.append(jnp.sum(q * (sd * sd - 1.0), axis=0))
        stats = jnp.stack(chans, axis=0) * scale_rows * inv_eff
        stats = jnp.sign(stats) * jnp.sqrt(jnp.abs(stats))
        norms = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(stats * stats, axis=1, keepdims=True), _EPS)
        )
        out_ref[j] = stats * norms


def forward_blocked(points, w, mu, sigma, n_eff, block_b):
    B, N, _ = points.shape
    K = mu.shape[0]
    assert B % block_b == 0
    pts_f = points.astype(jnp.float32)
    mu_t = jnp.transpose(mu.astype(jnp.float32))
    sigma_t = jnp.transpose(sigma.astype(jnp.float32))
    w_row = w.astype(jnp.float32)[None, :]
    n_eff = n_eff.astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, N, 3), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, K), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, 20, K), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        functools.partial(_kernel_blocked, block_b=block_b),
        out_shape=jax.ShapeDtypeStruct((B, 20, K), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=B * N * K * 30,
            bytes_accessed=B * (3 * N + 20 * K) * 4,
            transcendentals=B * N * K,
        ),
    )(n_eff, pts_f, mu_t, sigma_t, w_row)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=768)  # 256 x 3 scales
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--blocks", default="1,2,4,8")
    args = ap.parse_args()
    B, N = args.batch, args.n
    gmm = get_3d_grid_gmm([8, 8, 8], variance=0.0156)
    w, mu, sigma = (jnp.asarray(v, jnp.float32) for v in gmm.astuple())
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (B, N, 3)).astype(np.float32))
    n_eff = jnp.asarray(
        rng.randint(N // 2, N + 1, B).astype(np.int32)
    )

    ref_fn = jax.jit(lambda p, ne: jax.vmap(
        lambda pp, nn: tdmfv_n_est(pp[None], w, mu, sigma, nn[None],
                                   flatten=False)[0]
    )(p, ne))
    t0 = time.time()
    ref = np.asarray(ref_fn(pts, n_eff))
    print(f"jnp ref computed {time.time()-t0:.1f}s", flush=True)

    for bb in [int(x) for x in args.blocks.split(",")]:
        f = jax.jit(lambda p, ne, bb=bb: forward_blocked(p, w, mu, sigma, ne, bb))
        t0 = time.time()
        out = np.asarray(f(pts, n_eff))
        compile_s = time.time() - t0
        err = np.max(np.abs(out - ref))
        from nestinet_tpu.core.profiling import fetch_sync

        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            # fetch-sync: block_until_ready returns early on the axon
            # relay (core/profiling.py::block_sync_reliable)
            fetch_sync(f(pts, n_eff))
            ts.append(time.perf_counter() - t0)
        ms = statistics.median(ts) * 1e3
        print(f"block_b={bb}: {ms:8.2f} ms  max_err={err:.2e} "
              f"(compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
