"""Warm steady-state serving-mode sweep on the real chip.

For each (path, mode, dtype, batch) combination: one warmup pass over a
small shape list (compiles + caches), then a timed pass with
NESTINET_SERVING_TRACE=1 so the per-phase wall budget of the REAL
serving loop is printed alongside the rate.

Usage: python scripts/profile_modes.py log/moe_synth [--list bench2.txt]
       [--data data/synth_pcpnet] [--combos device_sparse:bfloat16:256,...]

A combo may carry a 4th field "fold" to serve the BN-folded checkpoint
(ops/fold.py), e.g. device_sparse:bfloat16:256:fold.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["NESTINET_SERVING_TRACE"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nestinet_tpu.infer.device_pipeline import predict_shapes_device  # noqa: E402
from nestinet_tpu.infer.predict import predict_shapes  # noqa: E402

DEFAULT_COMBOS = [
    "device_sparse:bfloat16:256",
    "device_sparse:bfloat16:512",
    "device_sparse:bfloat16:1024",
    "host_sparse:bfloat16:256",
    "host_sparse:bfloat16:512",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--list", default="bench2.txt")
    ap.add_argument("--data", default="data/synth_pcpnet")
    ap.add_argument("--combos", default=",".join(DEFAULT_COMBOS))
    args = ap.parse_args()

    for combo in args.combos.split(","):
        parts = combo.split(":")
        path, dtype, batch = parts[:3]
        fold = "fold" in parts[3:]
        extraction, mode = path.split("_")
        batch = int(batch)
        kw = dict(
            testset=args.list, data_path=args.data, batch_size=batch,
            moe_inference=mode, compute_dtype=dtype, fold_bn=fold,
        )

        def run(tag):
            if extraction == "device":
                return predict_shapes_device(
                    args.run_dir, dataset_name=tag, **kw
                )
            return predict_shapes(
                args.run_dir, dataset_name=tag, loader_workers=8, **kw
            )

        t0 = time.perf_counter()
        run(f"warm_{combo.replace(':', '_')}")
        warm_s = time.perf_counter() - t0
        stats = run(f"prof_{combo.replace(':', '_')}")
        print(json.dumps({
            "combo": combo,
            "warm_pass_s": round(warm_s, 1),
            "patches_per_sec": round(stats["patches_per_sec"], 1),
            "seconds": round(stats["seconds"], 2),
            "n_patches": stats["n_patches"],
            "forced_flushes": stats.get("forced_flushes"),
            "phases_ms_per_batch": stats.get("phases_ms_per_batch"),
        }), flush=True)


if __name__ == "__main__":
    main()
