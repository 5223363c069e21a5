"""Visualization + expert-statistics surface tests.

Smoke + semantics for the viz layer (parity targets:
`utils/visualization.py`, `MATLAB/compute_expert_statistics.m`,
`MATLAB/export_visualizations.m`) and the evaluate EXPORT branch
(`utils/evaluate.py:161-185`).  These are host-side matplotlib/numpy
tests; no jax involved.
"""

import os

import numpy as np
import pytest

from nestinet_tpu.eval.evaluate import evaluate_dataset
from nestinet_tpu.eval.expert_stats import (
    compute_expert_statistics,
    expert_statistics_for_shape,
)
from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.viz.clouds import (
    export_shape_visualizations,
    visualize_confusion_matrix,
)
from nestinet_tpu.viz.fv import draw_gaussian_points, draw_gaussians, visualize_fv


def _write_fixture(root, n=200, n_experts=3, seed=0):
    """A tiny one-shape dataset + MoE-style results tree."""
    rng = np.random.RandomState(seed)
    normals = rng.randn(n, 3)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    points = rng.uniform(-1, 1, size=(n, 3))
    pidx = rng.choice(n, size=n // 2, replace=False)

    data = os.path.join(root, "data")
    results = os.path.join(root, "results")
    os.makedirs(data)
    os.makedirs(results)
    np.savetxt(os.path.join(data, "shape.xyz"), points)
    np.savetxt(os.path.join(data, "shape.normals"), normals)
    np.savetxt(os.path.join(data, "shape.pidx"), pidx, fmt="%d")
    with open(os.path.join(data, "mini.txt"), "w") as f:
        f.write("shape\n")

    # predictions: sign-flipped GT (unoriented-perfect) + known experts
    np.savetxt(os.path.join(results, "shape.normals"), -normals)
    experts = rng.randint(0, n_experts, size=n)
    np.savetxt(os.path.join(results, "shape.experts"), experts, fmt="%d")
    return data, results, normals, experts, pidx


def test_expert_statistics_for_shape_semantics():
    gt = np.eye(3)
    pred = np.eye(3)
    # expert 1 gets two perfect points, expert 0 one perfect point
    err_sum, cnt = expert_statistics_for_shape(gt, pred, [0, 1, 1], 4)
    assert cnt.tolist() == [1, 2, 0, 0]
    np.testing.assert_allclose(err_sum, 0.0, atol=1e-4)


def test_compute_expert_statistics_files_and_counts(tmp_path):
    data, results, _, experts, pidx = _write_fixture(str(tmp_path))
    summary = compute_expert_statistics(
        data, results, "mini", n_experts=3, export_plots=True, log=lambda s: None
    )
    # use_subset=True: counts are over the pidx subset
    expected = np.bincount(experts[pidx], minlength=3)
    assert summary["count"] == expected.tolist()
    # unoriented-perfect predictions -> ~zero error everywhere
    assert max(summary["avg_error_deg"]) < 1e-2
    outdir = os.path.join(results, "images", "expert_statistics")
    assert os.path.exists(os.path.join(outdir, "mini_expert_statistics.json"))
    assert os.path.exists(os.path.join(outdir, "avg_error_all.png"))
    assert os.path.exists(os.path.join(outdir, "avg_error", "shape.png"))


def test_evaluate_export_writes_images(tmp_path):
    data, results, *_ = _write_fixture(str(tmp_path))
    summary = evaluate_dataset(
        data, results, "mini", export=True, n_experts=3, log=lambda s: None
    )
    assert summary["rms"] < 1e-2  # sign flips are invisible to the metric
    images = os.path.join(results, "images")
    assert os.path.exists(
        os.path.join(images, "phi_theta", "shape_phi_theta_domain.png")
    )
    for tag in ("normals_gt", "normals_pred", "error", "experts"):
        assert os.path.exists(os.path.join(images, f"shape_{tag}.png")), tag


def test_export_shape_visualizations_no_experts(tmp_path):
    rng = np.random.RandomState(1)
    pts = rng.randn(50, 3)
    nrm = rng.randn(50, 3)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    written = export_shape_visualizations(
        pts, nrm, nrm, str(tmp_path), "s", angle_errors=np.zeros(50)
    )
    assert len(written) == 3  # gt, pred, error; no experts render


def test_confusion_matrix_counts():
    _, cm = visualize_confusion_matrix([0, 0, 1, 2], [0, 1, 1, 2])
    assert cm.tolist() == [[1, 1, 0], [0, 1, 0], [0, 0, 1]]
    _, cmn = visualize_confusion_matrix([0, 0, 1], [0, 1, 1], normalize=True)
    np.testing.assert_allclose(cmn[0], [0.5, 0.5])


def test_fv_and_gmm_plots_smoke(tmp_path):
    gmm = get_3d_grid_gmm([3, 3, 3], variance=(1.0 / 3.0) ** 2)
    rng = np.random.RandomState(0)
    fv = rng.randn(2, 20, 27)
    fig = visualize_fv(fv, n_scales=1, filename=str(tmp_path / "fv"))
    assert os.path.exists(tmp_path / "fv.png")
    import matplotlib.pyplot as plt

    plt.close(fig)
    ax = draw_gaussians(gmm, filename=str(tmp_path / "gmm"))
    assert os.path.exists(tmp_path / "gmm.png")
    plt.close(ax.figure)
    pts = rng.uniform(-1, 1, size=(64, 3))
    ax = draw_gaussian_points(pts, gmm, 13, filename=str(tmp_path / "resp"))
    assert os.path.exists(tmp_path / "resp.png")
    plt.close(ax.figure)


def test_soft_assignment_rows_sum_to_one():
    from nestinet_tpu.ops.mups import soft_assignment_np

    gmm = get_3d_grid_gmm([2, 2, 2], variance=0.25)
    pts = np.random.RandomState(0).uniform(-1, 1, size=(32, 3))
    q = soft_assignment_np(pts, gmm)
    assert q.shape == (32, 8)
    np.testing.assert_allclose(q.sum(axis=1), 1.0, atol=1e-9)
    assert (q >= 0).all()


def test_seg_and_derivative_plots_smoke(tmp_path):
    import matplotlib.pyplot as plt

    from nestinet_tpu.viz.clouds import visualize_pc_seg, visualize_pc_seg_diff
    from nestinet_tpu.viz.fv import visualize_derivatives, visualize_fv_with_pc

    rng = np.random.RandomState(2)
    pts = rng.uniform(-1, 1, size=(80, 3))
    seg = rng.randint(0, 4, size=80)
    ax = visualize_pc_seg(pts, seg, 4, filename=str(tmp_path / "seg"))
    assert os.path.exists(tmp_path / "seg.png")
    plt.close(ax.figure)
    ax = visualize_pc_seg_diff(pts, seg, np.roll(seg, 1),
                               filename=str(tmp_path / "segdiff"))
    assert os.path.exists(tmp_path / "segdiff.png")
    plt.close(ax.figure)

    gmm = get_3d_grid_gmm([3, 3, 3], variance=(1.0 / 3.0) ** 2)
    fv = rng.randn(20, 27)
    fig = visualize_fv_with_pc(fv, pts, filename=str(tmp_path / "fvpc"))
    assert os.path.exists(tmp_path / "fvpc.png")
    plt.close(fig)
    fig = visualize_derivatives(pts, gmm, 13, filename=str(tmp_path / "deriv"))
    assert os.path.exists(tmp_path / "deriv.png")
    plt.close(fig)
