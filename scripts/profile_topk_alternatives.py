"""Can the ball-query's k-subset selection beat lax.top_k?

Extraction bisect: top_k(k=512) over [256, T] int32 keys costs ~2.2 ms
— the largest single op in the r=0.05 extraction.  Candidates:

  top_k          exact (today's path)
  approx_max_k   XLA's approximate top-k (PartialReduce); recall<1 may
                 drop true hits from oversized balls, so it would also
                 need n_eff recomputed from the hit mask — only worth
                 evaluating if the speedup is large
  sort_desc      full descending sort + slice (sanity reference)

Timing: 8x unrolled inside one program (dispatch amortization, see
profile_conv_zoo.py), 20 chained dispatches + one fetch.

Usage: python scripts/profile_topk_alternatives.py [--batch 256]
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

K = 512
UNROLL = 8


def timed(jf, args_fn, reps=20):
    _ = np.asarray(jax.tree.leaves(jf(*args_fn(0)))[0])
    t0 = time.perf_counter()
    out = None
    for r in range(reps):
        out = jf(*args_fn(r + 1))
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) * 1000.0 / reps / UNROLL


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    B = args.batch
    rng = np.random.RandomState(0)

    for T in (1024, 2048):
        keys = jnp.asarray(
            rng.randint(1, 2**31, size=(B, T), dtype=np.int32)
        )

        def mk(sel):
            def f(k_, s):
                tot = jnp.int32(0)
                for i in range(UNROLL):
                    ki = k_ ^ (s + i).astype(jnp.int32)
                    v, t = sel(ki)
                    tot = tot + v.sum() + t.sum()
                return tot
            return jax.jit(f)

        out = {"batch": B, "T": T, "k": K}
        out["top_k_ms"] = round(
            timed(mk(lambda x: jax.lax.top_k(x, K)),
                  lambda r: (keys, jnp.int32(r)), args.reps), 3)
        for recall in (0.95, 0.99):
            def sel(x, _r=recall):
                v, t = jax.lax.approx_max_k(
                    x.astype(jnp.float32), K, recall_target=_r
                )
                return v.astype(jnp.int32), t
            out[f"approx_{recall}_ms"] = round(
                timed(mk(sel), lambda r: (keys, jnp.int32(r)), args.reps), 3)

        def sel_sort(x):
            s = jnp.sort(x, axis=1)[:, ::-1][:, :K]
            return s, s
        out["sort_desc_ms"] = round(
            timed(mk(sel_sort), lambda r: (keys, jnp.int32(r)), args.reps), 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
