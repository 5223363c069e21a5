"""Device-resident extraction pipeline vs the host kd-tree path.

When `num_point` exceeds every ball's true size, both paths feed the
model the SAME neighbor sets (no subsampling), and MuPS is
permutation-invariant over patch points — so outputs must agree up to
float-order noise."""

import os

import jax
import numpy as np
import pytest

from nestinet_tpu.core import checkpoint as ckpt_lib
from nestinet_tpu.core.config import Config
from nestinet_tpu.core.rundir import RunDir
from nestinet_tpu.infer.device_pipeline import predict_shapes_device
from nestinet_tpu.infer.predict import predict_shapes
from nestinet_tpu.models import build_model
from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.train.train_step import make_optimizer


@pytest.fixture(scope="module")
def run_with_data(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("device_pipe"))
    rng = np.random.RandomState(11)
    n = 400
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    np.savetxt(os.path.join(root, "s.xyz"), v + 0.01 * rng.randn(n, 3))
    np.savetxt(os.path.join(root, "s.normals"), v)
    np.savetxt(os.path.join(root, "s.pidx"),
               rng.choice(n, 60, replace=False), fmt="%d")
    with open(os.path.join(root, "mini.txt"), "w") as f:
        f.write("s\n")

    # num_point=64 is far above any ball size at these radii on a
    # 400-point sphere -> no subsampling on either path.
    cfg = Config(
        model="ss_norm_est", log_dir=os.path.join(root, "run"),
        data_path=root, patch_radius=(0.15,), num_point=64,
        num_gaussians=3, gmm_variance=0.111, batch_size=16,
    )
    rd = RunDir.create(cfg.log_dir)
    cfg.save(rd.config_path)
    gmm = get_3d_grid_gmm([3, 3, 3], variance=cfg.gmm_variance)
    gmm.save(rd.gmm_path)
    model = build_model(cfg, gmm)
    batch = {
        "points": rng.uniform(-1, 1, (16, 64, 3)).astype(np.float32),
        "n_eff": np.full((16, 1), 64, np.int32),
    }
    params, state = model.init(jax.random.PRNGKey(0), batch)
    ckpt_lib.save(rd.ckpt_dir, params=params, state=state,
                  opt_state=make_optimizer(cfg).init(params), step=0, epoch=0)
    return root, rd.path


def test_device_matches_host_when_no_subsampling(run_with_data):
    root, run_path = run_with_data
    host = predict_shapes(run_path, dataset_name="host", testset="mini.txt",
                          data_path=root, batch_size=16, loader_workers=2)
    dev = predict_shapes_device(run_path, dataset_name="dev",
                                testset="mini.txt", data_path=root,
                                batch_size=16)
    assert host["n_patches"] == dev["n_patches"] == 400

    h = np.loadtxt(os.path.join(host["output_dir"], "s.normals"))
    d = np.loadtxt(os.path.join(dev["output_dir"], "s.normals"))
    hn = h / np.linalg.norm(h, axis=1, keepdims=True)
    dn = d / np.linalg.norm(d, axis=1, keepdims=True)
    gap = np.degrees(np.arccos(np.clip(np.abs((hn * dn).sum(1)), -1, 1)))
    assert gap.max() < 0.5, f"max direction gap {gap.max():.4f} deg"


def test_device_sparse_patches_matches_host(run_with_data):
    """With `sparse_patches`, both paths query only the .pidx subset
    (the reference's sparse-eval protocol, `test_n_est_w_experts.py:
    109-116`) and write one output row per pidx entry."""
    root, run_path = run_with_data
    host = predict_shapes(run_path, dataset_name="host_sp",
                          testset="mini.txt", data_path=root,
                          batch_size=16, loader_workers=2,
                          sparse_patches=True)
    dev = predict_shapes_device(run_path, dataset_name="dev_sp",
                                testset="mini.txt", data_path=root,
                                batch_size=16, sparse_patches=True)
    assert host["n_patches"] == dev["n_patches"] == 60
    h = np.loadtxt(os.path.join(host["output_dir"], "s.normals"))
    d = np.loadtxt(os.path.join(dev["output_dir"], "s.normals"))
    assert h.shape == d.shape == (60, 3)
    hn = h / np.linalg.norm(h, axis=1, keepdims=True)
    dn = d / np.linalg.norm(d, axis=1, keepdims=True)
    gap = np.degrees(np.arccos(np.clip(np.abs((hn * dn).sum(1)), -1, 1)))
    assert gap.max() < 0.5, f"max direction gap {gap.max():.4f} deg"


def test_device_pipeline_int8_smoke(run_with_data):
    """The bench's int8 sweep entry — device extraction + int8 CNN MACs
    (ops/quant.py) — must compose: same program structure as bf16, conv/
    matmul inner products emitted as s8xs8->s32.  Untrained weights make
    a numeric int8-vs-float comparison meaningless here (tests/test_int8
    pins closeness on bounded nets); this pins that the pipeline runs
    and produces usable directions."""
    root, run_path = run_with_data
    out = predict_shapes_device(run_path, dataset_name="dev_int8",
                                testset="mini.txt", data_path=root,
                                batch_size=16, compute_dtype="int8")
    d = np.loadtxt(os.path.join(out["output_dir"], "s.normals"))
    assert d.shape == (400, 3)
    assert np.isfinite(d).all()
    assert (np.linalg.norm(d, axis=1) > 0).all()


@pytest.fixture(scope="module")
def moe_dev_run(run_with_data, tmp_path_factory):
    """A tiny MoE run dir sharing run_with_data's point cloud."""
    root, _ = run_with_data
    out = str(tmp_path_factory.mktemp("moe_dev"))
    rng = np.random.RandomState(3)
    cfg = Config(
        model="experts_n_est", log_dir=os.path.join(out, "run"),
        data_path=root, patch_radius=(0.15, 0.3), num_point=64,
        num_gaussians=3, gmm_variance=0.111, batch_size=16,
        n_experts=3, expert_dict={0: [0], 1: [1], 2: [0, 1]},
    )
    rd = RunDir.create(cfg.log_dir)
    cfg.save(rd.config_path)
    gmm = get_3d_grid_gmm([3, 3, 3], variance=cfg.gmm_variance)
    gmm.save(rd.gmm_path)
    model = build_model(cfg, gmm)
    batch = {
        "points": rng.uniform(-1, 1, (16, 128, 3)).astype(np.float32),
        "n_eff": np.full((16, 2), 64, np.int32),
    }
    params, state = model.init(jax.random.PRNGKey(0), batch)
    ckpt_lib.save(rd.ckpt_dir, params=params, state=state,
                  opt_state=make_optimizer(cfg).init(params), step=0, epoch=0)
    return root, rd.path


def test_device_pipeline_moe_outputs(moe_dev_run):
    """MoE variant writes .experts/.experts_probs through the device
    path too."""
    root, run_path = moe_dev_run
    rd = RunDir.open(run_path)

    stats = predict_shapes_device(rd.path, dataset_name="dev",
                                  testset="mini.txt", data_path=root,
                                  batch_size=16)
    od = stats["output_dir"]
    assert np.loadtxt(os.path.join(od, "s.normals")).shape == (400, 3)
    ex = np.loadtxt(os.path.join(od, "s.experts"))
    assert ex.shape == (400,) and set(np.unique(ex)) <= {0, 1, 2}
    probs = np.loadtxt(os.path.join(od, "s.experts_probs"))
    assert probs.shape == (400, 3)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-4)

    # Sparse routing (the default above) must match the dense program:
    # same routing decisions, same per-patch normal directions.  Raw
    # normals are compared as directions because XLA fuses extraction +
    # MuPS differently into the one-program dense forward vs the
    # two-program sparse path, which perturbs f32 grid values at the
    # ULP level — amplified to ~1e-6 relative on this UNTRAINED
    # (exploding, |n|~1e13) fixture net.
    dense = predict_shapes_device(rd.path, dataset_name="dev_dense",
                                  testset="mini.txt", data_path=root,
                                  batch_size=16, moe_inference="dense")
    dd = dense["output_dir"]
    np.testing.assert_array_equal(
        np.loadtxt(os.path.join(od, "s.experts")),
        np.loadtxt(os.path.join(dd, "s.experts")),
    )
    s = np.loadtxt(os.path.join(od, "s.normals"))
    d = np.loadtxt(os.path.join(dd, "s.normals"))
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    gap = np.degrees(np.arccos(np.clip(np.abs((s * d).sum(1)), -1, 1)))
    assert gap.max() < 0.01, f"max sparse-vs-dense gap {gap.max():.5f} deg"
    np.testing.assert_allclose(
        np.loadtxt(os.path.join(od, "s.experts_probs")),
        np.loadtxt(os.path.join(dd, "s.experts_probs")), atol=1e-5,
    )


def test_device_data_parallel_matches_single(moe_dev_run):
    """Device-extraction serving sharded over the 8-device CPU mesh
    (queries + routing-FIFO batch axis sharded, cloud grids and params
    replicated) produces the same routing decisions and normal
    directions as single-device — the multi-chip story for the fastest
    serving mode (SURVEY §2.7 TPU-equivalent #1)."""
    root, run_path = moe_dev_run
    common = dict(testset="mini.txt", data_path=root, batch_size=16)
    single = predict_shapes_device(run_path, dataset_name="ddp1", **common)
    multi = predict_shapes_device(run_path, dataset_name="ddp8",
                                  data_parallel=8, **common)
    assert multi["n_patches"] == single["n_patches"] == 400
    np.testing.assert_array_equal(
        np.loadtxt(os.path.join(multi["output_dir"], "s.experts")),
        np.loadtxt(os.path.join(single["output_dir"], "s.experts")),
    )
    s = np.loadtxt(os.path.join(single["output_dir"], "s.normals"))
    m = np.loadtxt(os.path.join(multi["output_dir"], "s.normals"))
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    gap = np.degrees(np.arccos(np.clip(np.abs((s * m).sum(1)), -1, 1)))
    assert gap.max() < 0.01, f"max dp8-vs-dp1 gap {gap.max():.5f} deg"
    np.testing.assert_allclose(
        np.loadtxt(os.path.join(multi["output_dir"], "s.experts_probs")),
        np.loadtxt(os.path.join(single["output_dir"], "s.experts_probs")),
        atol=1e-5,
    )


def test_device_data_parallel_dense_matches_single(moe_dev_run):
    """Dense device path under the data mesh: same outputs, no FIFO."""
    root, run_path = moe_dev_run
    common = dict(testset="mini.txt", data_path=root, batch_size=16,
                  moe_inference="dense")
    single = predict_shapes_device(run_path, dataset_name="ddd1", **common)
    multi = predict_shapes_device(run_path, dataset_name="ddd8",
                                  data_parallel=8, **common)
    np.testing.assert_array_equal(
        np.loadtxt(os.path.join(multi["output_dir"], "s.experts")),
        np.loadtxt(os.path.join(single["output_dir"], "s.experts")),
    )
    s = np.loadtxt(os.path.join(single["output_dir"], "s.normals"))
    m = np.loadtxt(os.path.join(multi["output_dir"], "s.normals"))
    s /= np.linalg.norm(s, axis=1, keepdims=True)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    gap = np.degrees(np.arccos(np.clip(np.abs((s * m).sum(1)), -1, 1)))
    assert gap.max() < 0.01, f"max dense dp8-vs-dp1 gap {gap.max():.5f} deg"
