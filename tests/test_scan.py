"""Depth -> xyz -> normals -> image: the real-scan pipeline end to end
(Python absorption of the reference's MATLAB scan tooling)."""

import os

import jax
import numpy as np
import pytest

from nestinet_tpu.core import checkpoint as ckpt_lib
from nestinet_tpu.core.config import Config
from nestinet_tpu.core.rundir import RunDir
from nestinet_tpu.infer.scan import load_depth, predict_scan
from nestinet_tpu.models import build_model
from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.train.train_step import make_optimizer


@pytest.fixture(scope="module")
def ss_run(tmp_path_factory):
    """A tiny single-scale run dir (random weights: pipeline test)."""
    root = str(tmp_path_factory.mktemp("scan_run"))
    cfg = Config(
        model="ss_norm_est", log_dir=os.path.join(root, "run"),
        patch_radius=(0.3,), num_point=16, num_gaussians=3,
        gmm_variance=0.111, batch_size=8,
    )
    rd = RunDir.create(cfg.log_dir)
    cfg.save(rd.config_path)
    gmm = get_3d_grid_gmm([3, 3, 3], variance=cfg.gmm_variance)
    gmm.save(rd.gmm_path)
    model = build_model(cfg, gmm)
    rng = np.random.RandomState(0)
    batch = {
        "points": rng.uniform(-1, 1, (8, 16, 3)).astype(np.float32),
        "n_eff": np.full((8, 1), 16, np.int32),
    }
    params, state = model.init(jax.random.PRNGKey(0), batch)
    ckpt_lib.save(rd.ckpt_dir, params=params, state=state,
                  opt_state=make_optimizer(cfg).init(params), step=0, epoch=0)
    return rd.path


def _plane_depth(h=24, w=32, z=2.0):
    """Constant-depth plane with a hole of invalid pixels."""
    depth = np.full((h, w), z)
    depth[:4, :4] = 0.0
    intrinsic = np.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1.0]])
    return depth, intrinsic


def test_predict_scan_end_to_end(ss_run, tmp_path):
    depth, intrinsic = _plane_depth()
    stats = predict_scan(
        ss_run, depth, intrinsic, None,
        batch_size=8, loader_workers=2,
        output_dir=str(tmp_path / "out"), project_to_image=True,
    )
    n_valid = int((depth != 0).sum())
    assert stats["points"].shape == (n_valid, 3)
    assert stats["n_patches"] == n_valid
    normals = np.loadtxt(stats["normals_path"])
    assert normals.shape == (n_valid, 3)
    assert np.isfinite(normals).all()
    img = stats["normal_image"]
    assert img.shape == depth.shape + (3,)
    # hole pixels stay zero; most valid pixels receive a normal
    assert np.all(img[:4, :4] == 0.0)
    filled = np.any(img != 0, axis=-1).sum()
    assert filled > 0.8 * n_valid


def test_load_depth_formats(tmp_path):
    d = np.random.RandomState(0).rand(6, 7)
    np.save(tmp_path / "d.npy", d)
    np.testing.assert_array_equal(load_depth(str(tmp_path / "d.npy")), d)
    np.savetxt(tmp_path / "d.txt", d)
    np.testing.assert_allclose(load_depth(str(tmp_path / "d.txt")), d)
    try:
        from PIL import Image
    except ImportError:
        return
    mm = (d * 1000).astype(np.uint16)
    Image.fromarray(mm).save(tmp_path / "d.png")
    np.testing.assert_array_equal(load_depth(str(tmp_path / "d.png")), mm)
