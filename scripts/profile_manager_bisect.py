"""Bisect the manager CNN's serving time on the real chip.

profile_progA puts the manager at ~27.7 ms bf16 / ~19.7 ms int8 per
256-batch while the conv-only MXU roofline is ~19 ms bf16 / ~9.5 ms
int8 — this script locates the ~8 ms of non-conv time.  Three probes:

  prefix    cumulative backbone-layer prefixes (jitted standalone, the
            fc head excluded) — which BLOCK pays;
  nopool    the same manager with avg_pool3d monkeypatched to identity
            and max_pool3d to strided slicing (wrong numbers, right
            cost structure) — bounds the total pooling cost;
  fchead    manager minus the backbone (features faked) — the
            1024/256/128 head + softmax cost in isolation.

Timing: K chained dispatches + one fetch (relay rules, docs/PERF.md
"Measurement rules").

Usage: python scripts/profile_manager_bisect.py log/moe_synth60 \
           [--batch 256] [--dtypes bfloat16,int8]
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

from nestinet_tpu.infer.predict import load_run, restore_model
from nestinet_tpu.models import backbones
from nestinet_tpu.ops import nn as nnops


def timed(jf, args_fn, reps=20):
    out = jf(*args_fn(0))
    _ = np.asarray(jax.tree.leaves(out)[0])  # compile + settle
    t0 = time.perf_counter()
    for r in range(reps):
        out = jf(*args_fn(r + 1))
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) * 1000.0 / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--dtypes", default="bfloat16,int8")
    args = ap.parse_args()
    B = args.batch

    for dtype in args.dtypes.split(","):
        rd, cfg, gmm, model = load_run(args.run_dir, compute_dtype=dtype)
        n_scales = len(cfg.patch_radius)
        sample = {
            "points": np.zeros((B, n_scales * cfg.num_point, 3), np.float32),
            "n_eff": np.full((B, n_scales), cfg.num_point, np.int32),
        }
        params, state = restore_model(rd, cfg, model, sample)
        res = model.resolution
        rng = np.random.RandomState(0)
        grid = jnp.asarray(
            rng.randn(B, res, res, res, 20 * n_scales), jnp.float32
        ).astype(model.compute_dtype)

        out = {"dtype": dtype, "batch": B}

        # -- full manager (reference point) --
        full = jax.jit(
            lambda g, s: model.apply_manager_on_grid(params, state, g)[0]
            + 0 * s.astype(jnp.float32)
        )
        out["full_ms"] = round(
            timed(full, lambda r: (grid, jnp.uint32(r)), args.reps), 2
        )

        # -- cumulative backbone prefixes (manager spec, no fc head) --
        spec = backbones.CONV_NET_8G if res == 8 else backbones.CONV_NET_3G
        import haiku as hk

        for i in range(1, len(spec) + 1):
            prefix = spec[:i]

            def bb(g, is_training, bn_momentum, _p=prefix):
                return nnops.run_backbone(g, _p, is_training, bn_momentum)

            fwd = hk.transform_with_state(bb)
            p0, s0 = fwd.init(jax.random.PRNGKey(0), grid, False, 0.9)
            p0 = jax.tree.map(lambda x: x.astype(jnp.float32), p0)

            def run(g, s, _f=fwd, _p=p0, _s=s0):
                y, _ = _f.apply(
                    _p, _s, None, g + 0 * s.astype(g.dtype), False, 0.9
                )
                return nnops.unwrap(y)[0].sum()  # int8 tracing yields ActQ

            with model.quant_ctx():
                ms = timed(jax.jit(run), lambda r: (grid, jnp.uint32(r)),
                           args.reps)
            out[f"prefix{i}_{spec[i-1][0]}_ms"] = round(ms, 2)

        # -- pooling cost bound: identity avg pool, slice max pool --
        real_avg, real_max = nnops.avg_pool3d, nnops.max_pool3d
        try:
            nnops.avg_pool3d = lambda x, k, s, **kw: x
            nnops.max_pool3d = (
                lambda x, k, s: nnops.unwrap(x)[0][:, ::s, ::s, ::s]
            )

            def bb2(g, is_training, bn_momentum):
                return nnops.run_backbone(g, spec, is_training, bn_momentum)

            fwd2 = hk.transform_with_state(bb2)
            p2, s2 = fwd2.init(jax.random.PRNGKey(0), grid, False, 0.9)
            p2 = jax.tree.map(lambda x: x.astype(jnp.float32), p2)

            def run2(g, s):
                y, _ = fwd2.apply(
                    p2, s2, None, g + 0 * s.astype(g.dtype), False, 0.9
                )
                return nnops.unwrap(y)[0].sum()  # int8 tracing yields ActQ

            with model.quant_ctx():
                out["backbone_nopool_ms"] = round(
                    timed(jax.jit(run2), lambda r: (grid, jnp.uint32(r)),
                          args.reps), 2)
        finally:
            nnops.avg_pool3d, nnops.max_pool3d = real_avg, real_max

        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
