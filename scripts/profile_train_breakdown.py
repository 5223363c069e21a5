"""Train-step stage breakdown on the real chip (VERDICT r3 #5).

Times three jitted programs on the flagship MoE config at B=256 and
reads the stages from their deltas:

  fwd        MuPS + full dense forward + loss (value only)
  fwd+bwd    value_and_grad (adds the backward pass)
  full step  fwd + bwd + optimizer update + BN state fold (production
             `make_train_step`, donated buffers)

Timing: chained dispatches + one fetch (relay rules, docs/PERF.md).
Params stay device-resident; batches are device-put once.

Usage: python scripts/profile_train_breakdown.py [--batch 256]
           [--dtypes float32,bfloat16]
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

from nestinet_tpu.core.config import Config
from nestinet_tpu.models import build_model
from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.train.train_step import make_optimizer, make_train_step


def timed(jf, args_fn, reps=10):
    out = jf(*args_fn(0))
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]  # compile + settle
    t0 = time.perf_counter()
    for r in range(reps):
        out = jf(*args_fn(r + 1))
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:4]
    return (time.perf_counter() - t0) * 1000.0 / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtypes", default="float32,bfloat16")
    args = ap.parse_args()
    B = args.batch

    for dtype in args.dtypes.split(","):
        cfg = Config(
            model="experts_n_est", patch_radius=(0.01, 0.03, 0.05),
            num_point=512, num_gaussians=8, gmm_variance=0.0156,
            batch_size=B, n_experts=7, compute_dtype=dtype,
        )
        gmm = get_3d_grid_gmm([8, 8, 8], variance=cfg.gmm_variance)
        model = build_model(cfg, gmm)
        rng = np.random.RandomState(0)
        batch = {
            "points": jnp.asarray(
                rng.uniform(-1, 1, (B, 3 * cfg.num_point, 3)), jnp.float32
            ),
            "n_eff": jnp.full((B, 3), cfg.num_point, jnp.int32),
            "normals": jnp.asarray(rng.randn(B, 3), jnp.float32),
        }
        batch = jax.device_put(batch, jax.devices()[0])
        params, state = model.init_jitted(jax.random.PRNGKey(0), batch)
        params = jax.block_until_ready(params)
        tx = make_optimizer(cfg)
        opt_state = tx.init(params)

        key = jax.random.PRNGKey(1)

        def loss_only(p, s, b, step):
            outputs, _ = model.apply(p, s, None, b, True, 0.7)
            loss, _ = model.loss(outputs, b)
            return loss + 0.0 * step.astype(jnp.float32)

        def grad_only(p, s, b, step):
            def f(pp):
                outputs, ns = model.apply(pp, s, None, b, True, 0.7)
                loss, _ = model.loss(outputs, b)
                return loss
            loss, grads = jax.value_and_grad(f)(p)
            # reduce grads to a scalar so the fetch is one number but the
            # whole backward is still computed
            tot = loss + 0.0 * step.astype(jnp.float32)
            for leaf in jax.tree.leaves(grads):
                tot = tot + jnp.sum(leaf.astype(jnp.float32)) * 1e-30
            return tot

        out = {"dtype": dtype, "batch": B}
        jf = jax.jit(loss_only)
        out["fwd_ms"] = round(
            timed(jf, lambda r: (params, state, batch, jnp.uint32(r)),
                  args.reps), 1)
        jf = jax.jit(grad_only)
        out["fwd_bwd_ms"] = round(
            timed(jf, lambda r: (params, state, batch, jnp.uint32(r)),
                  args.reps), 1)

        # full production step (donated) — run on fresh copies so donation
        # doesn't consume the shared params; time by re-feeding outputs.
        step_fn = jax.jit(
            make_train_step(model, cfg, tx), donate_argnums=(0, 1, 2)
        )
        p, s, o = jax.device_put((params, state, opt_state))
        t0 = time.perf_counter()
        loss = None
        for r in range(args.reps):
            p, s, o, loss = step_fn(
                p, s, o, key, batch, jnp.asarray(r, jnp.int32)
            )
        _ = float(loss)
        warm_incl = (time.perf_counter() - t0) * 1000.0 / args.reps
        # first call included compile; redo timed-only pass
        t0 = time.perf_counter()
        for r in range(args.reps):
            p, s, o, loss = step_fn(
                p, s, o, key, batch, jnp.asarray(r, jnp.int32)
            )
        _ = float(loss)
        out["full_step_ms"] = round(
            (time.perf_counter() - t0) * 1000.0 / args.reps, 1)
        out["bwd_delta_ms"] = round(out["fwd_bwd_ms"] - out["fwd_ms"], 1)
        out["opt_delta_ms"] = round(
            out["full_step_ms"] - out["fwd_bwd_ms"], 1)
        out["patches_per_sec"] = round(B / out["full_step_ms"] * 1000.0, 1)
        del warm_incl

        # ---- MuPS double-forward cost (VERDICT r4 weak #5) ----
        # The Pallas kernel's custom VJP re-derives the jnp forward at
        # backward time (remat-style), so training pays MuPS forward
        # twice (Pallas + jnp) plus the jnp backward.  Quantify all
        # three against the pure-jnp alternative XLA would run without
        # the kernel.
        from nestinet_tpu.ops.mups import tdmfv_n_est
        from nestinet_tpu.ops.pallas.mups_kernel import tdmfv_n_est_pallas

        gw = jnp.asarray(gmm.weights, jnp.float32)
        gmu = jnp.asarray(gmm.means, jnp.float32)
        gsig = jnp.asarray(gmm.sigma, jnp.float32)
        pts1 = batch["points"][:, : cfg.num_point]
        ne1 = batch["n_eff"][:, 0]

        def mups_pallas_fwd(p_, r):
            return jnp.sum(
                tdmfv_n_est_pallas(p_ + 0.0 * r, gw, gmu, gsig, ne1)
            )

        def mups_pallas_fwd_bwd(p_, r):
            return jnp.sum(jax.grad(
                lambda x: jnp.sum(tdmfv_n_est_pallas(x, gw, gmu, gsig, ne1))
            )(p_ + 0.0 * r))

        def mups_jnp_fwd_bwd(p_, r):
            return jnp.sum(jax.grad(
                lambda x: jnp.sum(
                    tdmfv_n_est(x, gw, gmu, gsig, ne1, flatten=False)
                )
            )(p_ + 0.0 * r))

        for name, f in (("mups_pallas_fwd", mups_pallas_fwd),
                        ("mups_pallas_fwd_bwd", mups_pallas_fwd_bwd),
                        ("mups_jnp_fwd_bwd", mups_jnp_fwd_bwd)):
            out[name + "_ms"] = round(timed(
                jax.jit(f),
                lambda r: (pts1, jnp.float32(r)), args.reps), 2)
        # x3 scales the single-radius probe to the 3-scale flagship step
        out["mups_bwd_overhead_pct_of_step"] = round(
            100.0 * 3 * (out["mups_pallas_fwd_bwd_ms"]
                         - out["mups_jnp_fwd_bwd_ms"])
            / out["full_step_ms"], 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
