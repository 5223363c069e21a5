"""Bisect the pathological manager / vmapped-experts costs on the axon chip.

Questions (from profile_breakdown results: manager 3.4 s, experts_all
25.5 s vs one expert 43 ms at B=256):
  1. Which backbone layer makes the manager 80x slower than its FLOPs?
     -> time run_backbone prefixes of CONV_NET_8G.
  2. Is vmap-over-stacked-params conv the experts_all killer?
     -> time group0 as vmap vs an unrolled python loop in one program.
  3. Is a bare big conv fast?
     -> lax.conv_general_dilated 5^3 768->128 at 8^3.

Results append to /tmp/profile_bisect.jsonl.
"""

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

import haiku as hk

from nestinet_tpu.models import backbones
from nestinet_tpu.ops.nn import run_backbone

B = int(os.environ.get("BISECT_BATCH", "256"))
OUT = "/tmp/profile_bisect.jsonl"


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.ravel(leaf)[:8])


def timeit(fn, *args, repeats=5):
    t0 = time.perf_counter()
    _force(fn(*args))
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(repeats)]
    for o in outs:
        _force(o)
    total = time.perf_counter() - t0
    return total / repeats * 1e3, warm


def emit(stage, **fields):
    rec = dict(stage=stage, batch=B, **fields)
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.randn(B, 8, 8, 8, 60).astype(np.float32))

    # ---- 3. bare conv speed-of-light check ----
    x768 = jnp.asarray(rng.randn(B, 8, 8, 8, 768).astype(np.float32))
    k = jnp.asarray(rng.randn(5, 5, 5, 768, 128).astype(np.float32) * 0.01)

    def bare_conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    ms, warm = timeit(jax.jit(bare_conv), x768, k)
    emit("bare_conv_5x768x128_8cube", ms=ms, first_call_s=warm,
         gflop=B * 512 * 125 * 768 * 128 * 2 / 1e9)

    # ---- 1. manager backbone prefixes ----
    spec = backbones.CONV_NET_8G
    for i in range(1, len(spec) + 1):
        prefix = spec[:i]
        t = hk.transform_with_state(
            lambda x, prefix=prefix: run_backbone(x, prefix, False, 0.0)
        )
        params, state = t.init(jax.random.PRNGKey(0), grid)
        app = jax.jit(lambda p, s, x, t=t: t.apply(p, s, None, x)[0])
        ms, warm = timeit(app, params, state, grid)
        emit(f"manager_prefix_{i}", ms=ms, first_call_s=warm,
             layers=str(prefix[-1]))

    del x768, k

    # ---- 2. experts: vmap vs unrolled loop ----
    espec = backbones.expert_backbone_8g(128)
    t = hk.transform_with_state(
        lambda x: run_backbone(x, espec, False, 0.0)
    )
    x20 = grid[..., :20]
    G = 6
    ps, ss = [], []
    for g in range(G):
        p, s = t.init(jax.random.PRNGKey(g), x20)
        ps.append(p)
        ss.append(s)
    stacked_p = jax.tree.map(lambda *xs: jnp.stack(xs), *ps)
    stacked_s = jax.tree.map(lambda *xs: jnp.stack(xs), *ss)
    xs = jnp.stack([x20] * G)

    def vmapped(p, s, x):
        return jax.vmap(lambda pp, ss_, xx: t.apply(pp, ss_, None, xx)[0])(p, s, x)
    ms, warm = timeit(jax.jit(vmapped), stacked_p, stacked_s, xs)
    emit("experts6_vmap", ms=ms, first_call_s=warm)

    def unrolled(p, s, x):
        outs = []
        for g in range(G):
            pg = jax.tree.map(lambda a, g=g: a[g], p)
            sg = jax.tree.map(lambda a, g=g: a[g], s)
            outs.append(t.apply(pg, sg, None, x[g])[0])
        return jnp.stack(outs)
    ms, warm = timeit(jax.jit(unrolled), stacked_p, stacked_s, xs)
    emit("experts6_unrolled", ms=ms, first_call_s=warm)


if __name__ == "__main__":
    main()
