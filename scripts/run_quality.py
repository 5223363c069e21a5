"""Quality protocol driver: trained run -> six-testset RMS/PGP table.

Runs the full PCPNet evaluation protocol (`/root/reference/utils/
evaluate.py:40-41,139-151`) against a trained flagship run on the
synthetic protocol benchmark (`data/synth_pcpnet`, built by
`cli.synth` — the real PCPNet download is unreachable from this host,
see QUALITY.md): inference per testset (pidx-sparse patches, the
reference's eval subset), then one `cli.evaluate` across all six, then
a markdown table on stdout.

All six testsets run IN ONE PROCESS: the axon relay's compile cache
does not persist across processes, so the old subprocess-per-testset
design recompiled the serving programs six times (~20 min of pure
compile per sweep).  In-process, `infer.predict.load_run` caches the
model object and its compiled programs across testsets.

Usage:
    python scripts/run_quality.py <run_dir> [--data data/synth_pcpnet]
        [--dtype bfloat16|float32|int8] [--mode sparse|dense]
        [--extraction host|device] [--batch 256]
"""

import argparse
import json
import os
import subprocess
import sys
import time

TESTSETS = [
    "testset",
    "testset_whitenoise_small",
    "testset_whitenoise_medium",
    "testset_whitenoise_large",
    "testset_vardensity_gradient",
    "testset_vardensity_striped",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--data", default="data/synth_pcpnet")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--mode", default=None)
    ap.add_argument("--extraction", default=None,
                    help="host (default) or device (fused ball-query path)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--fold_bn", type=int, default=None,
                    help="1: BN-folded serving (ops/fold.py)")
    ap.add_argument("--results_name", default="synthq")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    os.environ.pop("NESTINET_SERVING_TRACE", None)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from nestinet_tpu.infer.predict import predict_shapes

    results_dir = os.path.join(args.run_dir, f"{args.results_name}_results")
    kwargs = dict(
        dataset_name=args.results_name,
        data_path=args.data,
        batch_size=args.batch,
        sparse_patches=True,
    )
    if args.dtype:
        kwargs["compute_dtype"] = args.dtype
    if args.mode:
        kwargs["moe_inference"] = args.mode
    if args.fold_bn is not None:
        kwargs["fold_bn"] = bool(args.fold_bn)

    if args.extraction == "device":
        from nestinet_tpu.infer.device_pipeline import predict_shapes_device

        def run_one(ts):
            return predict_shapes_device(
                args.run_dir, testset=f"{ts}.txt", **kwargs
            )
    else:
        def run_one(ts):
            return predict_shapes(
                args.run_dir, testset=f"{ts}.txt", loader_workers=8, **kwargs
            )

    rates = {}
    for ts in TESTSETS:
        t0 = time.perf_counter()
        stats = run_one(ts)
        rates[ts] = stats.get("patches_per_sec")
        shown = "?" if rates[ts] is None else round(rates[ts])
        print(f"[quality] {ts}: tested in {time.perf_counter()-t0:.1f}s "
              f"({shown} patches/s)",
              file=sys.stderr, flush=True)

    # evaluation is host-only numpy; a subprocess keeps this process's
    # JAX state out of it (and matches how users run the CLI).
    ev = subprocess.run(
        [
            sys.executable, "-m", "nestinet_tpu.cli.evaluate",
            "--data_path", args.data,
            "--normal_results_path", results_dir,
            "--dataset_list", *TESTSETS,
        ],
        env=dict(os.environ), capture_output=True, text=True,
    )
    if ev.returncode != 0:
        print(ev.stdout[-2000:], ev.stderr[-2000:], file=sys.stderr)
        sys.exit("cli.evaluate failed")

    rows = []
    for ts in TESTSETS:
        path = os.path.join(results_dir, "summary", f"{ts}_evaluation_results.txt")
        vals = {}
        with open(path) as f:
            for line in f:
                for key, tag in (("rms", "RMS not oriented (shape average):"),
                                 ("pgp5", "PGP5 average:"),
                                 ("pgp10", "PGP10 average:")):
                    if line.startswith(tag):
                        vals[key] = float(line.split(":")[1])
        rows.append((ts, vals))

    print("\n| testset | RMS (deg) | PGP5 | PGP10 | test patches/s |")
    print("|---|---|---|---|---|")
    for ts, v in rows:
        r = rates.get(ts)
        print(f"| {ts} | {v.get('rms', float('nan')):.3f} "
              f"| {v.get('pgp5', float('nan')):.3f} "
              f"| {v.get('pgp10', float('nan')):.3f} "
              f"| {r and round(r) or '—'} |")
    avg = sum(v["rms"] for _, v in rows) / len(rows)
    print(f"\naverage RMS: {avg:.3f} deg")
    # machine-readable line for bench parity pins (scripts/ consumers)
    print(json.dumps({
        "run_dir": args.run_dir,
        "extraction": args.extraction or "host",
        "dtype": args.dtype or "default",
        "mode": args.mode or "default",
        "rms": {ts: v.get("rms") for ts, v in rows},
        "avg_rms": avg,
    }))


if __name__ == "__main__":
    main()
