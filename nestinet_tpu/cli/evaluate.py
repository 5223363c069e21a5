"""Evaluation CLI (parity: `utils/evaluate.py:20-29`).

Example:
    python -m nestinet_tpu.cli.evaluate \
        --normal_results_path=log/my_experts/pcpnet_results/ \
        --data_path=data/pcpnet/ \
        --dataset_list testset testset_whitenoise_small \
            testset_whitenoise_medium testset_whitenoise_large \
            testset_vardensity_gradient testset_vardensity_striped
"""

from __future__ import annotations

import argparse

from ..eval.evaluate import evaluate_datasets


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--normal_results_path", default="log/my_experts/pcpnet_results/")
    p.add_argument("--data_path", type=str, default="data/pcpnet/")
    p.add_argument("--sparse_patches", type=int, default=1)
    p.add_argument("--dataset_list", type=str, nargs="+", default=["testset"])
    args = p.parse_args(argv)

    evaluate_datasets(
        args.data_path,
        args.normal_results_path,
        args.dataset_list,
        sparse_patches=bool(args.sparse_patches),
    )


if __name__ == "__main__":
    main()
