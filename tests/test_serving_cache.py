"""The process-level serving caches (infer/predict.py) must reuse
compiled programs across calls AND invalidate when the checkpoint on
disk changes — a long-running server that reloads an updated run dir
must serve the new weights."""

import os

import numpy as np

import jax

from nestinet_tpu.core import checkpoint as ckpt_lib
from nestinet_tpu.core.config import Config
from nestinet_tpu.core.rundir import RunDir
from nestinet_tpu.infer import predict as predict_mod
from nestinet_tpu.infer.predict import predict_shapes
from nestinet_tpu.models import build_model
from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.train.train_step import make_optimizer

from .fixtures import make_plane, write_pcpnet_dataset


def _make_run(tmp_path, rng, seed):
    root = str(tmp_path / "data")
    write_pcpnet_dataset(
        root, {"plane": make_plane(60, rng, noise=0.002)},
        list_name="testset.txt", n_pidx=10,
    )
    cfg = Config(
        model="ss_norm_est",
        log_dir=str(tmp_path / "run"),
        data_path=root,
        patch_radius=(0.3,),
        num_point=8,
        num_gaussians=3,
        gmm_variance=0.111,
        batch_size=8,
    )
    rd = RunDir.create(cfg.log_dir)
    cfg.save(rd.config_path)
    gmm = get_3d_grid_gmm([3, 3, 3], variance=cfg.gmm_variance)
    gmm.save(rd.gmm_path)
    model = build_model(cfg, gmm)
    batch = {
        "points": np.asarray(
            np.random.RandomState(seed).uniform(-1, 1, (8, 8, 3)), np.float32
        ),
        "n_eff": np.full((8, 1), 8, np.int32),
    }
    params, state = model.init_jitted(jax.random.PRNGKey(seed), batch)
    opt_state = make_optimizer(cfg).init(params)
    ckpt_lib.save(rd.ckpt_dir, params=params, state=state,
                  opt_state=opt_state, step=0, epoch=0)
    return rd, cfg, gmm, model, root, (params, state, opt_state)


def test_restore_cache_reuses_and_invalidates(tmp_path, rng):
    rd, cfg, gmm, model, root, (params, state, opt_state) = _make_run(
        tmp_path, rng, seed=0
    )

    def run(tag):
        return predict_shapes(
            rd.path, dataset_name=tag, testset="testset.txt",
            data_path=root, batch_size=8, loader_workers=0,
        )

    out1 = np.loadtxt(os.path.join(run("a")["output_dir"], "plane.normals"))

    # same checkpoint -> cached restore (same object identity)
    n_restores_before = len(predict_mod._RESTORE_CACHE)
    out2 = np.loadtxt(os.path.join(run("b")["output_dir"], "plane.normals"))
    assert len(predict_mod._RESTORE_CACHE) == n_restores_before
    np.testing.assert_array_equal(out1, out2)

    # overwrite the checkpoint with DIFFERENT weights -> outputs change
    model2 = build_model(cfg, gmm)
    batch = {
        "points": np.asarray(rng.uniform(-1, 1, (8, 8, 3)), np.float32),
        "n_eff": np.full((8, 1), 8, np.int32),
    }
    p2, s2 = model2.init_jitted(jax.random.PRNGKey(123), batch)
    os.utime(rd.ckpt_dir)  # ensure a distinct mtime even on coarse clocks
    ckpt_lib.save(rd.ckpt_dir, params=p2, state=s2,
                  opt_state=make_optimizer(cfg).init(p2), step=1, epoch=1)
    meta = os.path.join(rd.ckpt_dir, ckpt_lib.META_NAME)
    os.utime(meta, (os.path.getmtime(meta) + 2, os.path.getmtime(meta) + 2))

    out3 = np.loadtxt(os.path.join(run("c")["output_dir"], "plane.normals"))
    assert not np.array_equal(out1, out3), (
        "serving cache served stale weights after checkpoint update"
    )
