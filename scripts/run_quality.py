"""Quality protocol driver: trained run -> six-testset RMS/PGP table.

Runs the full PCPNet evaluation protocol (`/root/reference/utils/
evaluate.py:40-41,139-151`) against a trained flagship run on the
synthetic protocol benchmark (`data/synth_pcpnet`, built by
`cli.synth` — the real PCPNet download is unreachable from this host,
see QUALITY.md): `cli.test` per testset (pidx-sparse patches, the
reference's eval subset), then one `cli.evaluate` across all six, then
a markdown table on stdout.

Usage:
    python scripts/run_quality.py <run_dir> [--data data/synth_pcpnet]
        [--dtype bfloat16|float32] [--mode sparse|dense] [--batch 256]
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
    ap.add_argument("--results_name", default="synthq")
    args = ap.parse_args()

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    # The serving trace injects nested dicts into cli.test's stats JSON,
    # which would break the brace-scan parse below — and tracing every
    # protocol pass is noise anyway.
    env.pop("NESTINET_SERVING_TRACE", None)
    results_dir = os.path.join(args.run_dir, f"{args.results_name}_results")

    rates = {}
    for ts in TESTSETS:
        cmd = [
            sys.executable, "-m", "nestinet_tpu.cli.test",
            "--results_path", args.run_dir,
            "--dataset_path", args.data,
            "--dataset_name", args.results_name,
            "--testset", f"{ts}.txt",
            "--sparse_patches", "1",
            "--batch_size", str(args.batch),
        ]
        if args.dtype:
            cmd += ["--compute_dtype", args.dtype]
        if args.mode:
            cmd += ["--moe_inference", args.mode]
        if args.extraction:
            cmd += ["--extraction", args.extraction]
        t0 = time.perf_counter()
        out = subprocess.run(cmd, env=env, capture_output=True, text=True)
        if out.returncode != 0:
            print(out.stdout[-2000:], out.stderr[-2000:], file=sys.stderr)
            sys.exit(f"cli.test failed on {ts}")
        # the CLI prints a JSON report as its last {...} block; scan
        # candidate start braces from the end so nested objects inside
        # the report don't break the parse.
        rates[ts] = None
        pos = len(out.stdout)
        while True:
            pos = out.stdout.rfind("{", 0, pos)
            if pos < 0:
                break
            try:
                rates[ts] = json.loads(out.stdout[pos:]).get("patches_per_sec")
                break
            except json.JSONDecodeError:
                continue
        shown = "?" if rates[ts] is None else round(rates[ts])
        print(f"[quality] {ts}: tested in {time.perf_counter()-t0:.1f}s "
              f"({shown} patches/s)",
              file=sys.stderr, flush=True)

    ev = subprocess.run(
        [
            sys.executable, "-m", "nestinet_tpu.cli.evaluate",
            "--data_path", args.data,
            "--normal_results_path", results_dir,
            "--dataset_list", *TESTSETS,
        ],
        env=env, capture_output=True, text=True,
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


if __name__ == "__main__":
    main()
