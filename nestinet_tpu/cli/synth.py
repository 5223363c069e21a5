"""Synthetic PCPNet-protocol benchmark builder CLI.

Materializes an analytic-surface dataset with the exact PCPNet list
layout (train/validation lists plus the six canonical testsets,
`/root/reference/utils/evaluate.py:40-41`) so the full
train -> test -> evaluate pipeline runs end-to-end on hosts with no
network access to the real PCPNet download (see QUALITY.md).

Example:
    python -m nestinet_tpu.cli.synth --root data/synth_pcpnet \
        --n_points 50000 --n_pidx 5000
"""

from __future__ import annotations

import argparse

from ..data.synthetic import build_protocol_benchmark, build_switching_benchmark


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="data/synth_pcpnet")
    p.add_argument("--n_points", type=int, default=50_000)
    p.add_argument("--n_pidx", type=int, default=5_000)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument(
        "--switching", action="store_true",
        help="build the noise-switching regime instead (sigmas straddle "
             "the 0.015 hard-switch threshold; see data/synthetic.py)",
    )
    args = p.parse_args(argv)
    build = build_switching_benchmark if args.switching else build_protocol_benchmark
    sets = build(
        args.root, n_points=args.n_points, n_pidx=args.n_pidx, seed=args.seed
    )
    for name, shapes in sets.items():
        print(f"{name}: {len(shapes)} shapes")


if __name__ == "__main__":
    main()
