"""Component-level timing of flagship MoE inference on the real chip.

Answers VERDICT r1 #3: where does the per-batch serving time go?  Times
each stage of the compiled path separately (median of repeats, with
block_until_ready) and reports compile wall time per program — through
the axon tunnel, compile latency is a first-class cost.

Stages (select with --only, comma-separated; default all):
  upload        host->device transfer of one batch of patches
  mups_pallas   fused Pallas 3DmFV kernel (points -> [B,8,8,8,60] grid)
  mups_jnp      XLA broadcast-reduce variant of the same
  manager       manager CNN on a precomputed grid
  expert_g0     one single-scale expert CNN on a precomputed grid slice
  experts_all   all 7 experts (grouped vmap) on a precomputed grid
  dense_fwd     full dense program (MuPS + manager + all experts + pack)
  fetch         device->host of the packed [B, 4+E] result
  dispatch      trivial-program round trip (latency floor)

Results append to --out (JSON lines) so multi-invocation sessions
accumulate one dataset.  Parameters are initialized on the CPU backend
(shapes are batch-independent) and device_put to the TPU — initializing
on-chip would add a multi-minute compile through the tunnel.

Usage: python scripts/profile_breakdown.py --batch 256 --only mups_pallas,manager
"""

import argparse
import json
import os
import statistics
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
from nestinet_tpu.ops.mups import mups

NUM_POINT = 512
RADII = (0.01, 0.03, 0.05)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


class Report:
    def __init__(self, path, meta):
        self.path = path
        self.meta = meta

    def emit(self, stage, **fields):
        rec = dict(self.meta, stage=stage, **fields)
        line = json.dumps(rec)
        print(line, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")


def _force(out):
    """Force completion by fetching a few bytes of the first leaf.

    On the axon relay backend, block_until_ready returns immediately
    (verified: a 2.2 TFLOP matmul chain 'completed' in 0.03 ms under
    block_until_ready but takes ~21 ms when a host fetch forces it);
    only a device->host read truly synchronizes.  Fetch a tiny slice so
    the wire cost stays negligible."""
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.ravel(leaf)[:8])


def timeit(fn, *args, repeats=10, warmup=1):
    t0 = time.perf_counter()
    for _ in range(warmup):
        _force(fn(*args))
    warm = time.perf_counter() - t0
    # Dispatch all repeats back-to-back (device executions serialize),
    # then force each output: total/repeats amortizes the ~50 ms
    # dispatch+fetch round-trip latency out of the per-call figure.
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(repeats)]
    for o in outs:
        _force(o)
    total = time.perf_counter() - t0
    return total / repeats * 1e3, warm  # (amortized ms, first-call s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--only", default="")
    ap.add_argument("--out", default="/tmp/profile_breakdown.jsonl")
    args = ap.parse_args()
    B = args.batch
    stages = set(args.only.split(",")) if args.only else None

    def want(name):
        return stages is None or name in stages

    rep = Report(args.out, {"batch": B, "dtype": args.dtype,
                            "backend": jax.default_backend()})

    cfg = Config(
        model="experts_n_est", patch_radius=RADII, num_point=NUM_POINT,
        num_gaussians=8, gmm_variance=0.0156, batch_size=B, n_experts=7,
        compute_dtype=args.dtype,
    )
    gmm = get_3d_grid_gmm([8, 8, 8], variance=cfg.gmm_variance)
    model = build_model(cfg, gmm)
    rng = np.random.RandomState(0)
    host_points = rng.uniform(-1, 1, (B, 3 * NUM_POINT, 3)).astype(np.float32)
    host_neff = np.full((B, 3), NUM_POINT, np.int32)

    # init on CPU (batch-independent shapes), then upload
    t0 = time.perf_counter()
    cpu = jax.devices("cpu")[0]
    small = {
        "points": host_points[:4],
        "n_eff": host_neff[:4],
    }
    with jax.default_device(cpu):
        params, state = jax.jit(model.init)(jax.random.PRNGKey(0), small)
        params = jax.block_until_ready(params)
    log(f"cpu init {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    # Explicit target device: device_put with NO device argument is a
    # no-op for arrays already committed to the CPU backend — the params
    # silently stay host-resident and every downstream program re-uploads
    # ~713 MB through the tunnel per call (the round-2 "3.4 s manager /
    # 115 s dense" anomaly was exactly this).
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    state = jax.device_put(state, dev)
    jax.block_until_ready((params, state))
    log(f"param upload {time.perf_counter()-t0:.1f}s")

    batch = {"points": jnp.asarray(host_points), "n_eff": jnp.asarray(host_neff)}
    jax.block_until_ready(batch)

    if want("upload"):
        def upload():
            a = jax.device_put(host_points)
            b = jax.device_put(host_neff)
            return a, b
        ms, _ = timeit(upload, repeats=args.repeats)
        rep.emit("upload", ms=ms, mb=host_points.nbytes / 1e6)

    if want("dispatch"):
        triv = jax.jit(lambda x: x + 1.0)
        small_x = jnp.zeros((8,), jnp.float32)
        ms, warm = timeit(triv, small_x, repeats=args.repeats)
        rep.emit("dispatch", ms=ms, first_call_s=warm)

    w, mu, sig = (jnp.asarray(v, jnp.float32) for v in gmm.astuple())

    for impl in ("pallas", "jnp"):
        name = f"mups_{impl}"
        if not want(name):
            continue
        if impl == "pallas" and jax.default_backend() != "tpu":
            continue
        f = jax.jit(
            lambda p, ne, impl=impl: mups(
                p, ne, w, mu, sig, n_scales=3, resolution=8, impl=impl
            )
        )
        ms, warm = timeit(f, batch["points"], batch["n_eff"],
                          repeats=args.repeats)
        rep.emit(name, ms=ms, first_call_s=warm)

    need_grid = any(want(s) for s in ("manager", "expert_g0", "experts_all",
                                      "fetch_grid"))
    if need_grid:
        gridf = jax.jit(
            lambda p, ne: mups(p, ne, w, mu, sig, n_scales=3, resolution=8,
                               impl=model.mups_impl).astype(model.compute_dtype)
        )
        grid = jax.block_until_ready(gridf(batch["points"], batch["n_eff"]))

    if want("manager"):
        mgr = jax.jit(
            lambda pp, ss, g: model._manager.apply(pp, ss, None, g, False, 0.0)[0]
        )
        ms, warm = timeit(mgr, params["manager"], state["manager"], grid,
                          repeats=args.repeats)
        rep.emit("manager", ms=ms, first_call_s=warm)

    if want("expert_g0"):
        g0 = model.groups[0]
        fwd0 = model._expert_fwd[g0.n_scales]
        p0 = jax.tree.map(lambda a: a[0], params["group0"])
        s0 = jax.tree.map(lambda a: a[0], state["group0"])
        x0 = grid[..., : g0.channels]
        e0 = jax.jit(lambda pp, ss, x: fwd0.apply(pp, ss, None, x, False, 0.0)[0])
        ms, warm = timeit(e0, p0, s0, x0, repeats=args.repeats)
        rep.emit("expert_g0", ms=ms, first_call_s=warm)

    if want("experts_all"):
        def experts_only(pp, ss, g):
            outs = []
            for gi, group in enumerate(model.groups):
                fwd = model._expert_fwd[group.n_scales]
                xs = model._group_inputs(g, group)

                def one(p, s, x, _fwd=fwd):
                    return _fwd.apply(p, s, None, x, False, 0.0)

                o, _ = jax.vmap(one)(pp[f"group{gi}"], ss[f"group{gi}"], xs)
                outs.append(o)
            return jnp.concatenate(outs, 0)
        ms, warm = timeit(jax.jit(experts_only), params, state, grid,
                          repeats=args.repeats)
        rep.emit("experts_all", ms=ms, first_call_s=warm)

    if want("dense_fwd") or want("fetch"):
        def dense_fwd(pp, ss, bb):
            outputs, _ = model.apply(pp, ss, None, bb, False, 0.0)
            normals = model.predict_normals(outputs)
            experts, probs = model.predict_experts(outputs)
            return jnp.concatenate(
                [normals, experts[:, None].astype(jnp.float32), probs], axis=1
            )
        dense = jax.jit(dense_fwd)
        if want("dense_fwd"):
            ms, warm = timeit(dense, params, state, batch, repeats=args.repeats)
            rep.emit("dense_fwd", ms=ms, first_call_s=warm,
                     implied_patches_per_s=B / (ms / 1e3))
        if want("fetch"):
            out = jax.block_until_ready(dense(params, state, batch))
            ms, _ = timeit(lambda: np.asarray(out), repeats=args.repeats)
            rep.emit("fetch", ms=ms, kb=out.size * out.dtype.itemsize / 1e3)


if __name__ == "__main__":
    main()
