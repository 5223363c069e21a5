"""Measure the MXU tile-waste fix candidate for the inception branches.

profile_manager_bisect found incep1 (and the experts' early blocks)
tile-LIMITED: conv2/conv3 have cout = n/2 (64 on the manager's first
block), half a 128-wide MXU tile, so the 5^3 conv runs at ~2x its MAC
time in BOTH dtypes.  Candidate fix: run conv2+conv3 as ONE 5^3 conv
with cout = n, embedding conv2's 3^3 kernel in the center of a 5^3
kernel (zeros elsewhere) — identical math (SAME padding, same taps),
one full-tile conv instead of two half-tile convs.

This probe times, at B=256 on the 8^3 grid, per dtype:
  split    k3(cin->n/2) + k5(cin->n/2)  (today's structure)
  merged   k5(cin->n)                   (candidate)
for the manager's incep1 (cin=128, n=128) and incep2/3 (cin=256, n=256)
branch shapes.

Usage: python scripts/profile_merged_branch.py [--batch 256]
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

DIMS3 = ("NDHWC", "DHWIO", "NDHWC")


def timed(jf, args_fn, reps=20):
    _ = np.asarray(jax.tree.leaves(jf(*args_fn(0)))[0])  # compile
    t0 = time.perf_counter()
    out = None
    for r in range(reps):
        out = jf(*args_fn(r + 1))
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) * 1000.0 / reps


def conv(x, w, int8):
    if int8:
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), "SAME", dimension_numbers=DIMS3,
            preferred_element_type=jnp.int32,
        )
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), "SAME", dimension_numbers=DIMS3
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    B = args.batch
    rng = np.random.RandomState(0)

    for dtype_name, adt, wdt in (
        ("int8", jnp.int8, jnp.int8),
        ("bfloat16", jnp.bfloat16, jnp.bfloat16),
    ):
        int8 = dtype_name == "int8"
        for cin, n in ((128, 128), (256, 256)):
            x = jnp.asarray(
                rng.randint(-127, 127, size=(B, 8, 8, 8, cin)), adt
            ) if int8 else jnp.asarray(
                rng.randn(B, 8, 8, 8, cin), adt
            )
            w3 = jnp.asarray(
                rng.randint(-127, 127, size=(3, 3, 3, cin, n // 2)), wdt
            ) if int8 else jnp.asarray(rng.randn(3, 3, 3, cin, n // 2), wdt)
            w5 = jnp.asarray(
                rng.randint(-127, 127, size=(5, 5, 5, cin, n // 2)), wdt
            ) if int8 else jnp.asarray(rng.randn(5, 5, 5, cin, n // 2), wdt)
            # conv2's 3^3 kernel embedded at the center of a 5^3 kernel:
            # SAME padding + central embedding => identical receptive
            # field and outputs for that half of the channels.
            w3in5 = jnp.zeros((5, 5, 5, cin, n // 2), wdt)
            w3in5 = w3in5.at[1:4, 1:4, 1:4].set(w3)
            wm = jnp.concatenate([w3in5, w5], axis=-1)  # [5,5,5,cin,n]

            def split(x, s):
                xx = x + (s * 0).astype(x.dtype)
                return (
                    conv(xx, w3, int8).sum() + conv(xx, w5, int8).sum()
                )

            def merged(x, s):
                xx = x + (s * 0).astype(x.dtype)
                return conv(xx, wm, int8).sum()

            out = {"dtype": dtype_name, "cin": cin, "n": n, "batch": B}
            out["split_ms"] = round(
                timed(jax.jit(split), lambda r: (x, jnp.int32(r)), args.reps), 2
            )
            out["merged_ms"] = round(
                timed(jax.jit(merged), lambda r: (x, jnp.int32(r)), args.reps), 2
            )
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
