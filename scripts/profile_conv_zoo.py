"""Measured per-conv floors for the flagship backbones (both dtypes).

The dense-MAC "roofline" from datasheet TOPS is not achievable for
every conv shape on this chip (profile_merged_branch measured a 5^3
int8 conv at ~29% of 394 TOPS), so the terminal per-chip ceiling must
be built from MEASURED per-shape conv times, not peak arithmetic.

This times every distinct (kernel, cin, cout) conv the manager
(CONV_NET_8G + FC head) and the three expert bodies
(expert_backbone_8g(128/64/42)) execute at inference, standalone jitted
at B=256, in bf16 and int8 (s8xs8->s32 with f32 epilogue, matching
ops/quant.py), and prints per-shape ms + achieved GMAC/ms.  The sum
over a network's conv list is its measured conv floor: what a perfect
scheduler with zero elementwise/pool/quant overhead would pay.

Usage: python scripts/profile_conv_zoo.py [--batch 256] [--nets manager,expert128]
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


def inception_convs(cin, n, ks, spatial):
    """(kernel, cin, cout, spatial) list of one inception block."""
    k1, k2 = ks
    return [
        (1, cin, n, spatial),        # conv1
        (k1, n, n // 2, spatial),    # conv2
        (k2, n, n // 2, spatial),    # conv3
        (1, cin, n, spatial),        # conv4 (on pooled input, same shape)
    ]


def backbone_convs(spec, cin, spatial):
    out = []
    for entry in spec:
        if entry[0] == "incep":
            _, n, ks = entry
            out += inception_convs(cin, n, ks, spatial)
            cin = 3 * n
        else:  # maxpool
            _, k, s = entry
            spatial = max(1, spatial // s)
    return out, cin, spatial


def nets():
    from nestinet_tpu.models import backbones

    result = {}
    convs, cout, sp = backbone_convs(backbones.CONV_NET_8G, 60, 8)
    result["manager"] = convs
    for first in (128, 64, 42):
        n_scales = 128 // first
        convs, _, _ = backbone_convs(
            backbones.expert_backbone_8g(first), 20 * n_scales, 8
        )
        result[f"expert{first}"] = convs
    return result


def timed(jf, args_fn, reps=20):
    _ = np.asarray(jax.tree.leaves(jf(*args_fn(0)))[0])  # compile
    t0 = time.perf_counter()
    out = None
    for r in range(reps):
        out = jf(*args_fn(r + 1))
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) * 1000.0 / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--nets", default="manager,expert128,expert64,expert42")
    ap.add_argument("--dtypes", default="int8,bfloat16")
    ap.add_argument("--min_spatial", type=int, default=8,
                    help="skip conv shapes below this grid size (the 4^3/"
                         "2^3 tail measures ~2 ms total in the manager "
                         "bisect; each zoo program costs a relay compile)")
    args = ap.parse_args()
    B = args.batch
    rng = np.random.RandomState(0)
    all_nets = {
        net: [s for s in convs if s[3] >= args.min_spatial]
        for net, convs in nets().items()
    }

    # dedupe shapes across the requested nets; report per-net sums after
    wanted = {}
    for net in args.nets.split(","):
        for shape in all_nets[net]:
            wanted.setdefault(shape, set()).add(net)

    # Small programs are dispatch-rate-limited through the relay (~2 ms
    # per chained call — a 0.3 GMAC 1x1 conv measured 1.7-2.2 ms raw),
    # so each timed program applies the conv UNROLL times on perturbed
    # inputs (no CSE) and the per-conv time is ms/UNROLL, leaving a
    # ~0.25 ms/conv dispatch residual instead of ~2 ms.
    UNROLL = 8
    shape_ms = {}
    for dtype_name in args.dtypes.split(","):
        int8 = dtype_name == "int8"
        for (k, cin, cout, sp) in sorted(wanted):
            if int8:
                x = jnp.asarray(
                    rng.randint(-100, 100, size=(B, sp, sp, sp, cin)), jnp.int8
                )
                w = jnp.asarray(
                    rng.randint(-127, 127, size=(k, k, k, cin, cout)), jnp.int8
                )

                def f(x, s, _w=w):
                    tot = jnp.int32(0)
                    for i in range(UNROLL):
                        xi = x + (s * 0 + i).astype(x.dtype)
                        acc = jax.lax.conv_general_dilated(
                            xi, _w, (1, 1, 1), "SAME",
                            dimension_numbers=DIMS3,
                            preferred_element_type=jnp.int32,
                        )
                        tot = tot + acc.sum()
                    return tot
            else:
                x = jnp.asarray(rng.randn(B, sp, sp, sp, cin), jnp.bfloat16)
                w = jnp.asarray(rng.randn(k, k, k, cin, cout), jnp.bfloat16)

                def f(x, s, _w=w):
                    tot = jnp.float32(0)
                    for i in range(UNROLL):
                        xi = x + (s * 0 + i).astype(x.dtype)
                        out = jax.lax.conv_general_dilated(
                            xi, _w, (1, 1, 1), "SAME", dimension_numbers=DIMS3
                        )
                        tot = tot + out.astype(jnp.float32).sum()
                    return tot

            jf = jax.jit(f)
            ms = timed(jf, lambda r: (x, jnp.int32(r)), args.reps) / UNROLL
            gmac = B * sp**3 * k**3 * cin * cout / 1e9
            shape_ms[(dtype_name, k, cin, cout, sp)] = ms
            print(json.dumps({
                "dtype": dtype_name, "k": k, "cin": cin, "cout": cout,
                "spatial": sp, "ms": round(ms, 3), "gmac": round(gmac, 1),
                "gmac_per_ms": round(gmac / ms, 1),
            }), flush=True)

    for net in args.nets.split(","):
        for dtype_name in args.dtypes.split(","):
            total = sum(
                shape_ms[(dtype_name, k, cin, cout, sp)]
                for (k, cin, cout, sp) in all_nets[net]
            )
            print(json.dumps({
                "net": net, "dtype": dtype_name,
                "measured_conv_floor_ms": round(total, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
