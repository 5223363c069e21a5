"""Sparse (argmax-only) MoE inference must produce byte-identical
results files to the dense reference path."""

import os

import jax
import numpy as np
import pytest

from nestinet_tpu.core import checkpoint as ckpt_lib
from nestinet_tpu.core.config import Config
from nestinet_tpu.core.rundir import RunDir
from nestinet_tpu.infer.predict import predict_shapes
from nestinet_tpu.models import build_model
from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.train.train_step import make_optimizer


@pytest.fixture(scope="module")
def moe_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sparse_moe"))
    rng = np.random.RandomState(5)
    for name in ("a", "b"):
        n = 300
        v = rng.randn(n, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        np.savetxt(os.path.join(root, f"{name}.xyz"), v + 0.01 * rng.randn(n, 3))
        np.savetxt(os.path.join(root, f"{name}.normals"), v)
    with open(os.path.join(root, "mini.txt"), "w") as f:
        f.write("a\nb\n")

    cfg = Config(
        model="experts_n_est",
        log_dir=os.path.join(root, "run"),
        data_path=root,
        patch_radius=(0.2, 0.4),
        num_point=16,
        num_gaussians=3,
        gmm_variance=0.111,
        batch_size=8,
        n_experts=3,
        expert_dict={0: [0], 1: [1], 2: [0, 1]},  # two architecture groups
    )
    rd = RunDir.create(cfg.log_dir)
    cfg.save(rd.config_path)
    gmm = get_3d_grid_gmm([3, 3, 3], variance=cfg.gmm_variance)
    gmm.save(rd.gmm_path)
    model = build_model(cfg, gmm)
    batch = {
        "points": rng.uniform(-1, 1, size=(8, 2 * 16, 3)).astype(np.float32),
        "n_eff": np.full((8, 2), 16, np.int32),
    }
    params, state = model.init(jax.random.PRNGKey(0), batch)
    opt_state = make_optimizer(cfg).init(params)
    ckpt_lib.save(rd.ckpt_dir, params=params, state=state,
                  opt_state=opt_state, step=0, epoch=0)
    return root, rd.path


def test_sparse_matches_dense(moe_run):
    root, run_path = moe_run
    common = dict(testset="mini.txt", data_path=root, batch_size=8,
                  loader_workers=2)
    dense = predict_shapes(run_path, dataset_name="dense",
                           moe_inference="dense", **common)
    sparse = predict_shapes(run_path, dataset_name="sparse",
                            moe_inference="sparse", **common)
    assert dense["n_patches"] == sparse["n_patches"] == 600

    for shape in ("a", "b"):
        for ext in (".normals", ".experts", ".experts_probs"):
            d = np.loadtxt(os.path.join(dense["output_dir"], shape + ext))
            s = np.loadtxt(os.path.join(sparse["output_dir"], shape + ext))
            if ext == ".normals":
                # untrained-BN activations are ~1e13; dynamic_slice vs
                # static slicing reorders float sums, so compare the
                # *directions* (what evaluate.py consumes) tightly.
                d = d / np.linalg.norm(d, axis=1, keepdims=True)
                s = s / np.linalg.norm(s, axis=1, keepdims=True)
                np.testing.assert_allclose(s, d, atol=2e-4, err_msg=f"{shape}{ext}")
            else:
                np.testing.assert_allclose(
                    s, d, rtol=1e-4, atol=1e-6, err_msg=f"{shape}{ext}"
                )


def test_sparse_handles_partial_buckets(moe_run):
    """batch_size larger than some expert's total count forces the
    flush-with-padding path."""
    root, run_path = moe_run
    stats = predict_shapes(run_path, dataset_name="sparse_big",
                           testset="mini.txt", data_path=root,
                           batch_size=128, loader_workers=2,
                           moe_inference="sparse")
    assert stats["n_patches"] == 600
    n = np.loadtxt(os.path.join(stats["output_dir"], "a.normals"))
    assert n.shape == (300, 3) and np.isfinite(n).all()


def test_sparse_small_window_matches_dense(moe_run):
    """A tiny FIFO window (W=4) forces slot evictions to interleave
    with the lagged (depth-behind-dispatch) manager queue: 75 batches
    cycle the 4 slots many times, and every grid must still route
    through its own expert before its slot is overwritten."""
    root, run_path = moe_run
    common = dict(testset="mini.txt", data_path=root, batch_size=8,
                  loader_workers=2)
    dense = predict_shapes(run_path, dataset_name="dense_w",
                           moe_inference="dense", **common)
    sparse = predict_shapes(run_path, dataset_name="sparse_w4",
                            moe_inference="sparse",
                            sparse_window_slots=4, **common)
    assert sparse["window_slots"] == 4
    assert sparse["n_patches"] == 600
    for shape in ("a", "b"):
        d = np.loadtxt(os.path.join(dense["output_dir"], shape + ".experts"))
        s = np.loadtxt(os.path.join(sparse["output_dir"], shape + ".experts"))
        np.testing.assert_array_equal(s, d)
        dn = np.loadtxt(os.path.join(dense["output_dir"], shape + ".normals"))
        sn = np.loadtxt(os.path.join(sparse["output_dir"], shape + ".normals"))
        dn = dn / np.linalg.norm(dn, axis=1, keepdims=True)
        sn = sn / np.linalg.norm(sn, axis=1, keepdims=True)
        np.testing.assert_allclose(sn, dn, atol=2e-4)


def test_multidevice_inference_matches_single(moe_run):
    """Batch-axis data-parallel inference over the 8-device CPU mesh
    produces the same results files as single-device."""
    root, run_path = moe_run
    common = dict(testset="mini.txt", data_path=root, batch_size=8,
                  loader_workers=2, moe_inference="sparse")
    single = predict_shapes(run_path, dataset_name="dp1", **common)
    multi = predict_shapes(run_path, dataset_name="dp8",
                           data_parallel=8, **common)
    for shape in ("a", "b"):
        d = np.loadtxt(os.path.join(single["output_dir"], shape + ".normals"))
        m = np.loadtxt(os.path.join(multi["output_dir"], shape + ".normals"))
        d = d / np.linalg.norm(d, axis=1, keepdims=True)
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        np.testing.assert_allclose(m, d, atol=2e-4)
        de = np.loadtxt(os.path.join(single["output_dir"], shape + ".experts"))
        me = np.loadtxt(os.path.join(multi["output_dir"], shape + ".experts"))
        np.testing.assert_array_equal(me, de)
