"""Streaming whole-shape inference.

Parity with `test_n_est_w_experts.py` / `test_n_est.py`: reload the run
directory's config + GMM + checkpoint, walk every point of every test
shape in order ('full' sampler), zero-pad the final partial batch to the
static batch size, and scatter outputs into `<shape>.normals`
(+ `.experts`, `.experts_probs` for the MoE model).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt_lib
from ..core.config import Config
from ..core.rundir import RunDir
from ..data.loader import get_data_loader
from ..models import build_model
from ..models.experts import ExpertsNormEst
from ..ops.gmm import GridGMM
from .writer import ShapeScatterWriter


def load_run(run_dir: str):
    """(cfg, gmm, model, params, state) from a run directory."""
    rd = RunDir.open(run_dir)
    cfg = Config.load(rd.config_path)
    gmm = GridGMM.load(rd.gmm_path)
    model = build_model(cfg, gmm)
    return rd, cfg, gmm, model


def restore_model(rd: RunDir, cfg: Config, model, sample_batch: dict):
    """Init templates and restore the checkpoint."""
    from ..train.train_step import make_optimizer

    rng = jax.random.PRNGKey(cfg.seed)
    batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
    params, state = model.init_jitted(rng, batch)
    opt_state = make_optimizer(cfg).init(params)
    params, state, _, _, _ = ckpt_lib.restore(
        rd.ckpt_dir, params=params, state=state, opt_state=opt_state
    )
    return params, state


def predict_shapes(
    run_dir: str,
    *,
    dataset_name: str = "pcpnet",
    testset: str = "testset.txt",
    data_path: str | None = None,
    batch_size: int = 128,
    sparse_patches: bool = False,
    loader_workers: int = 8,
    output_dir: str | None = None,
) -> dict:
    """Run inference for every shape in `testset`; returns stats."""
    rd, cfg, gmm, model = load_run(run_dir)
    indir = data_path if data_path is not None else cfg.data_path
    out_dir = output_dir if output_dir is not None else rd.results_dir(dataset_name)

    loader, dataset = get_data_loader(
        testset,
        indir=indir,
        batch_size=batch_size,
        patch_radius=cfg.patch_radius,
        points_per_patch=cfg.num_point,
        outputs=(),  # no targets at test time
        seed=cfg.seed,
        patch_center=cfg.patch_center,
        use_pca=cfg.use_pca,
        cache_capacity=cfg.cache_capacity,
        patch_sample_order="full",
        workers=loader_workers,
        sparse_patches=sparse_patches,
    )

    is_moe = isinstance(model, ExpertsNormEst)

    sample = next(iter(loader))
    params, state = restore_model(rd, cfg, model, _pad_batch(sample, batch_size))

    @jax.jit
    def fwd(params, state, batch):
        outputs, _ = model.apply(params, state, None, batch, False, 0.0)
        normals = model.predict_normals(outputs)
        if is_moe:
            experts, probs = model.predict_experts(outputs)
            return normals, experts, probs
        return normals

    writer = ShapeScatterWriter(
        out_dir,
        dataset.shape_names,
        dataset.shape_patch_count,
        n_experts=cfg.n_experts if is_moe else None,
    )

    def _drain(pending):
        """Materialize a dispatched batch's outputs into the writer."""
        real, outs = pending
        if is_moe:
            normals, experts, probs = outs
            writer.append(
                np.asarray(normals)[:real],
                np.asarray(experts)[:real],
                np.asarray(probs)[:real],
            )
        else:
            writer.append(np.asarray(outs)[:real])

    # One-deep software pipeline: jax dispatch is async, so batch i
    # computes on the TPU while the host loader extracts patches for
    # i+1 and the writer scatters i-1 (the reference ran these three
    # strictly serially each step, `test_n_est_w_experts.py:129-197`).
    n_patches = 0
    pending = None
    t0 = time.perf_counter()
    for batch in loader:
        real = batch["points"].shape[0]
        batch = _pad_batch(batch, batch_size)
        device_batch = {
            "points": jnp.asarray(batch["points"]),
            "n_eff": jnp.asarray(batch["n_eff"]),
        }
        outs = fwd(params, state, device_batch)
        if pending is not None:
            _drain(pending)
        pending = (real, outs)
        n_patches += real
    if pending is not None:
        _drain(pending)
    elapsed = time.perf_counter() - t0

    assert writer.done, "writer did not consume all shapes"
    return {
        "n_patches": n_patches,
        "seconds": elapsed,
        "patches_per_sec": n_patches / elapsed if elapsed > 0 else float("inf"),
        "shapes": writer.written,
        "output_dir": out_dir,
    }


def _pad_batch(batch: dict, batch_size: int) -> dict:
    """Zero-pad a partial batch to the static batch size (parity:
    `test_n_est_w_experts.py:134-140`)."""
    real = batch["points"].shape[0]
    if real == batch_size:
        return batch
    out = {}
    for k, v in batch.items():
        pad_shape = (batch_size - real,) + v.shape[1:]
        out[k] = np.concatenate([v, np.zeros(pad_shape, v.dtype)], axis=0)
    return out
