"""Switching-mechanism demonstration: measure the hard switch firing.

The reference's noise-switching model picks the small-scale branch iff
its noise head predicts < 0.015 (`ms_sw_n_est.py:82-84`).  On the
canonical PCPNet noise levels (all < 0.015) a correct switch routes
everything one way, so the mechanism is only demonstrable on a regime
with sigmas on BOTH sides of the threshold — `cli.synth --switching`
(`data/synthetic.py::build_switching_benchmark`).

This driver runs a trained ms_sw_n_est over `testset_switching.txt`
and reports, per GT noise level:
  * mean/median predicted noise (noise-head calibration),
  * the fraction routed through the small-scale branch (switch traffic),
  * unoriented RMS angle error,
plus the per-shape Pearson correlation between predicted and GT noise
— the four measurements QUALITY.md's switching section needs.

Usage:
    python scripts/switching_demo.py <run_dir> [--data data/synth_switching]
        [--batch 256] [--testset testset_switching.txt]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nestinet_tpu.data.loader import get_data_loader  # noqa: E402
from nestinet_tpu.data.pcpnet import read_noise_levels, read_shape_list  # noqa: E402
from nestinet_tpu.infer.predict import _pad_batch, load_run, restore_model  # noqa: E402
from nestinet_tpu.models.switching import (  # noqa: E402
    NOISE_SWITCH_THRESHOLD,
    SwitchingNormEst,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--data", default="data/synth_switching")
    ap.add_argument("--testset", default="testset_switching.txt")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    rd, cfg, gmm, model = load_run(args.run_dir)
    assert isinstance(model, SwitchingNormEst), (
        f"run is {cfg.model}, not ms_sw_n_est"
    )

    shape_names = read_shape_list(args.data, args.testset)
    gt_sigma = read_noise_levels(args.data, args.testset, len(shape_names))

    loader, dataset = get_data_loader(
        args.testset, indir=args.data, batch_size=args.batch,
        patch_radius=cfg.patch_radius, points_per_patch=cfg.num_point,
        outputs=("unoriented_normals",),  # GT normals ride along per patch
        seed=cfg.seed, patch_sample_order="full", workers=8,
        sparse_patches=True,
    )
    sample = next(iter(loader))
    params, state = restore_model(rd, cfg, model, _pad_batch(sample, args.batch))

    @jax.jit
    def fwd(params, state, batch):
        outputs, _ = model.apply(params, state, None, batch, False, 0.0)
        n = outputs["n_pred"]
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=1, keepdims=True), 1e-12)
        return jnp.concatenate(
            [n, outputs["noise_pred"][:, None]], axis=1
        )  # [B, 4]

    noise_pred, ang_err = [], []
    t0 = time.perf_counter()
    for batch in loader:
        real = batch["points"].shape[0]
        padded = _pad_batch(batch, args.batch)
        db = {"points": jnp.asarray(padded["points"]),
              "n_eff": jnp.asarray(padded["n_eff"])}
        out = np.asarray(fwd(params, state, db))[:real]
        gt = batch["normals"] / np.maximum(
            np.linalg.norm(batch["normals"], axis=1, keepdims=True), 1e-12
        )
        cos = np.clip(np.abs(np.sum(out[:, :3] * gt, axis=1)), -1, 1)
        ang_err.append(np.degrees(np.arccos(cos)))
        noise_pred.append(out[:, 3])
    noise_pred = np.concatenate(noise_pred)
    ang_err = np.concatenate(ang_err)
    print(f"[demo] {noise_pred.shape[0]} patches in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # split the ordered stream back into shapes
    counts = dataset.shape_patch_count
    offsets = np.cumsum([0] + list(counts))
    per_shape = []
    for i, name in enumerate(shape_names):
        s = slice(offsets[i], offsets[i + 1])
        per_shape.append({
            "shape": name,
            "gt_sigma": float(gt_sigma[i]),
            "mean_noise_pred": float(noise_pred[s].mean()),
            "median_noise_pred": float(np.median(noise_pred[s])),
            "small_branch_frac": float(
                (noise_pred[s] < NOISE_SWITCH_THRESHOLD).mean()
            ),
            "rms_deg": float(np.sqrt(np.mean(ang_err[s] ** 2))),
        })

    # aggregate by GT noise level
    print("\n| GT sigma | mean noise_pred | small-branch share | RMS (deg) |")
    print("|---|---|---|---|")
    by_sigma = {}
    for row in per_shape:
        by_sigma.setdefault(row["gt_sigma"], []).append(row)
    for sigma in sorted(by_sigma):
        rows = by_sigma[sigma]
        mp = np.mean([r["mean_noise_pred"] for r in rows])
        sf = np.mean([r["small_branch_frac"] for r in rows])
        rms = np.sqrt(np.mean([r["rms_deg"] ** 2 for r in rows]))
        print(f"| {sigma:.3f} | {mp:.4f} | {sf:.2%} | {rms:.3f} |")

    sig = np.array([r["gt_sigma"] for r in per_shape])
    prd = np.array([r["mean_noise_pred"] for r in per_shape])
    corr = float(np.corrcoef(sig, prd)[0, 1])
    overall_small = float(np.mean(noise_pred < NOISE_SWITCH_THRESHOLD))
    overall_rms = float(np.sqrt(np.mean(ang_err ** 2)))
    print(f"\nper-shape corr(noise_pred, GT sigma): {corr:.4f}")
    print(f"overall small-branch share: {overall_small:.2%}")
    print(f"overall RMS: {overall_rms:.3f} deg")
    print(json.dumps({
        "run_dir": args.run_dir,
        "testset": args.testset,
        "n_patches": int(noise_pred.shape[0]),
        "corr_noise_pred_vs_gt": corr,
        "small_branch_share": overall_small,
        "rms_deg": overall_rms,
        "per_sigma": {
            f"{sigma:.3f}": {
                "mean_noise_pred": float(
                    np.mean([r["mean_noise_pred"] for r in by_sigma[sigma]])
                ),
                "small_branch_frac": float(
                    np.mean([r["small_branch_frac"] for r in by_sigma[sigma]])
                ),
                "rms_deg": float(np.sqrt(np.mean(
                    [r["rms_deg"] ** 2 for r in by_sigma[sigma]]
                ))),
            }
            for sigma in sorted(by_sigma)
        },
    }))


if __name__ == "__main__":
    main()
