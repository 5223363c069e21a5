"""Training orchestration.

The reference's epoch loop (`train_n_est_w_experts.py:165-348`) rebuilt
as: host prefetching data loader -> device-resident batches sharded over
the mesh -> one jitted SPMD train step (scheduled lr / BN decay computed
in-graph) -> per-epoch validation RMS -> periodic checkpoints WITH
deterministic resume (the reference had none).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt_lib
from ..core.config import Config
from ..core.profiling import StepTimer, trace
from ..core.rundir import RunDir
from ..data.augment import rotate_patches_and_normals
from ..data.loader import get_data_loader
from ..models import build_model
from ..ops.gmm import get_3d_grid_gmm
from .mesh import make_mesh, shard_batch
from .train_step import (
    jit_eval_step,
    jit_train_step,
    make_eval_step,
    make_optimizer,
    make_train_step,
    place_train_state,
)


class Trainer:
    def __init__(self, cfg: Config, run_dir: RunDir | None = None, mesh=None,
                 loader_workers: int = 8):
        if getattr(cfg, "fold_bn", False):
            # BN folding is a serving-only checkpoint transform
            # (ops/fold.py); under training the EMA state must keep
            # updating and mid-training validation must read it.
            import dataclasses

            cfg = dataclasses.replace(cfg, fold_bn=False)
        self.cfg = cfg
        self.rundir = run_dir if run_dir is not None else RunDir.create(cfg.log_dir)
        self.loader_workers = loader_workers

        self.gmm = get_3d_grid_gmm(
            [cfg.num_gaussians] * 3, variance=cfg.gmm_variance
        )
        self.model = build_model(cfg, self.gmm)
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.data_parallel, cfg.expert_parallel
        )
        assert cfg.batch_size % self.mesh.shape["data"] == 0, (
            "batch_size must divide over the data mesh axis"
        )

        self.tx = make_optimizer(cfg)
        self._train_step = jit_train_step(make_train_step(self.model, cfg, self.tx))
        self._eval_step = jit_eval_step(make_eval_step(self.model, cfg))

        # run-dir contract artifacts
        cfg.save(self.rundir.config_path)
        self.gmm.save(self.rundir.gmm_path)
        self.rundir.write_description(cfg.desc)

        self.params = None
        self.state = None
        self.opt_state = None
        self.step = 0
        self.start_epoch = 0
        self._ckpt_writer = ckpt_lib.AsyncCheckpointer()

    # ---- data ----
    def _outputs(self):
        return tuple(self.cfg.outputs)

    def make_loaders(self):
        cfg = self.cfg
        if cfg.point_tuple > 1:
            # Dataset-level capability only (provider.py:341): the MuPS
            # models consume [*, 3] points, so a 3*T-wide tuple batch
            # would fail deep inside jit with a broadcast error.  The
            # reference's entry points likewise always pass 1.
            raise ValueError(
                "point_tuple > 1 is a dataset-level encoding; the "
                "bundled MuPS models consume 3-D points — use "
                "get_data_loader(point_tuple=...) directly for custom "
                "consumers"
            )
        train_loader, _ = get_data_loader(
            cfg.trainset,
            indir=cfg.data_path,
            batch_size=cfg.batch_size,
            patch_radius=cfg.patch_radius,
            points_per_patch=cfg.num_point,
            outputs=self._outputs(),
            patch_point_count_std=cfg.patch_point_count_std,
            seed=cfg.seed,
            identical_epochs=cfg.identical_epochs,
            use_pca=cfg.use_pca,
            patch_center=cfg.patch_center,
            point_tuple=cfg.point_tuple,
            cache_capacity=cfg.cache_capacity,
            patches_per_shape=cfg.patches_per_shape,
            patch_sample_order="random",
            workers=self.loader_workers,
            drop_last=True,
        )
        val_loader, val_dataset = get_data_loader(
            cfg.testset,
            indir=cfg.data_path,
            batch_size=cfg.batch_size,
            patch_radius=cfg.patch_radius,
            points_per_patch=cfg.num_point,
            outputs=self._outputs(),
            patch_point_count_std=cfg.patch_point_count_std,
            seed=cfg.seed,
            identical_epochs=cfg.identical_epochs,
            use_pca=cfg.use_pca,
            patch_center=cfg.patch_center,
            point_tuple=cfg.point_tuple,
            cache_capacity=cfg.cache_capacity,
            patches_per_shape=cfg.patches_per_shape,
            patch_sample_order="random",
            workers=self.loader_workers,
            drop_last=True,
        )
        return train_loader, val_loader, val_dataset

    # ---- state ----
    def initialize(self, sample_batch: dict, resume: bool = True):
        rng = jax.random.PRNGKey(self.cfg.seed)
        batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
        params, state = self.model.init_jitted(rng, batch)
        opt_state = self.tx.init(params)
        self._ckpt_writer.wait()  # never restore under an in-flight write
        if resume and ckpt_lib.exists(self.rundir.ckpt_dir):
            params, state, opt_state, self.step, epoch = ckpt_lib.restore(
                self.rundir.ckpt_dir, params=params, state=state, opt_state=opt_state
            )
            self.start_epoch = epoch + 1
            self.rundir.log(f"resumed from epoch {epoch} (step {self.step})")
        self.params, self.state, self.opt_state = place_train_state(
            self.mesh,
            params,
            state,
            opt_state,
            moe=self.cfg.expert_parallel > 1,
        )

    # ---- loops ----
    def train_one_epoch(self, loader, epoch: int) -> float:
        cfg = self.cfg
        base_key = jax.random.PRNGKey(cfg.seed + 1)
        aug_rng = np.random.RandomState(cfg.seed + 17 + epoch)
        loss_sum, n_batches = 0.0, 0
        timer = StepTimer()
        with trace(
            os.path.join(self.rundir.path, "profile"),
            enabled=epoch == cfg.profile_epoch,
        ):
            # One-deep loss pipeline: materializing step i's loss only
            # after step i+1 is dispatched hides the device->host fetch
            # latency (a ~24 ms round trip on tunneled TPUs) behind the
            # next step's compute.
            pending_loss = None
            for batch in loader:
                if cfg.insert_rotation_augmentation:
                    batch = dict(batch)
                    batch["points"], batch["normals"] = rotate_patches_and_normals(
                        batch["points"], batch["normals"], aug_rng
                    )
                batch = shard_batch(batch, self.mesh)
                rng = jax.random.fold_in(base_key, self.step)
                with timer.step():
                    self.params, self.state, self.opt_state, loss = self._train_step(
                        self.params,
                        self.state,
                        self.opt_state,
                        rng,
                        batch,
                        jnp.asarray(self.step, jnp.int32),
                    )
                    if pending_loss is not None:
                        loss_sum += float(pending_loss)  # sync on step i-1
                    pending_loss = loss
                self.step += 1
                n_batches += 1
            if pending_loss is not None:
                loss_sum += float(pending_loss)
        mean_loss = loss_sum / max(n_batches, 1)
        self.rundir.log(f"epoch {epoch:4d} train mean loss: {mean_loss:.6f}")
        # lr / bn_decay mirror the reference's TB scalar set
        # (`train_n_est_w_experts.py:171-179`) — recomputed host-side
        # from the same pure schedules the jitted step uses.
        from .schedules import bn_momentum_schedule, learning_rate_schedule

        self.rundir.metrics(
            kind="train", epoch=epoch, step=self.step, loss=mean_loss,
            lr=float(learning_rate_schedule(cfg)(self.step)),
            bn_decay=float(bn_momentum_schedule(cfg)(self.step)),
            **{f"step_{k}": v for k, v in timer.summary().items()},
        )
        return mean_loss

    def eval_one_epoch(self, loader, dataset, epoch: int) -> tuple[float, float]:
        """Validation loss and mean RMS angle error.

        RMS follows the reference's aggregation: per-chunk RMS of
        patches_per_shape-sized rows when the count divides evenly
        (`train_n_est_w_experts.py:342-345`), otherwise a single overall
        RMS (robust fallback; the reference crashed on indivisibility).
        """
        loss_sum, n_batches = 0.0, 0
        cos_all = []
        pending = None  # one-deep: hide the per-batch fetch round trip
        for batch in loader:
            batch = shard_batch(batch, self.mesh)
            loss, cos_ang = self._eval_step(self.params, self.state, batch)
            if pending is not None:
                loss_sum += float(pending[0])
                cos_all.append(np.asarray(pending[1]))
            pending = (loss, cos_ang)
            n_batches += 1
        if pending is not None:
            loss_sum += float(pending[0])
            cos_all.append(np.asarray(pending[1]))
        mean_loss = loss_sum / max(n_batches, 1)
        cos_all = np.concatenate(cos_all) if cos_all else np.zeros((0,))
        ang = np.rad2deg(np.arccos(np.clip(np.abs(cos_all), -1.0, 1.0)))

        pps = self.cfg.patches_per_shape
        if ang.size and ang.size % pps == 0:
            rows = ang.reshape(-1, pps)
            rms = float(np.mean(np.sqrt(np.mean(rows ** 2, axis=1))))
        elif ang.size:
            rms = float(np.sqrt(np.mean(ang ** 2)))
        else:
            rms = float("nan")
        self.rundir.log(
            f"epoch {epoch:4d} eval mean loss: {mean_loss:.6f}  rms: {rms:.4f} deg"
        )
        self.rundir.metrics(
            kind="eval", epoch=epoch, step=self.step, loss=mean_loss, rms_deg=rms
        )
        return mean_loss, rms

    def save_checkpoint(self, epoch: int, periodic: bool = True,
                        best: bool = False):
        """Non-blocking: parallel device->host fetch on this thread
        (before the next step can donate the buffers), then msgpack
        serialization + atomic write on a background thread.

        periodic targets `ckpt/` (the resume checkpoint); best targets
        `ckpt_best/` (new-best validation RMS — serving prefers it).
        Both in one call share a single device fetch + encode."""
        dirs, tags = [], []
        if periodic:
            dirs.append(self.rundir.ckpt_dir)
            tags.append("checkpoint")
        if best:
            dirs.append(self.rundir.ckpt_best_dir)
            tags.append("best checkpoint")
        if not dirs:
            return
        tag = " + ".join(tags)
        self._ckpt_writer.save(
            dirs,
            params=self.params,
            state=self.state,
            opt_state=self.opt_state,
            step=self.step,
            epoch=epoch,
            on_done=lambda e, _t=tag: self.rundir.log(
                f"{_t} write completed for epoch {e}"
            ),
        )
        self.rundir.log(f"{tag} dispatched at epoch {epoch}")

    def _historical_best_rms(self) -> float:
        """Minimum eval RMS recorded in this run's metrics.jsonl (inf if
        none) — the resume-time seed for best-checkpoint tracking."""
        import json

        best = float("inf")
        path = os.path.join(self.rundir.path, "metrics.jsonl")
        try:
            with open(path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if rec.get("kind") == "eval":
                        rms = rec.get("rms_deg")
                        if rms is not None and np.isfinite(rms):
                            best = min(best, float(rms))
        except OSError:
            pass
        return best

    def fit(self, max_epoch: int | None = None, resume: bool = True):
        cfg = self.cfg
        if cfg.compute_dtype == "int8":
            raise ValueError(
                "compute_dtype='int8' is a serving-only mode (post-training "
                "dynamic quantization, ops/quant.py); train in float32 or "
                "bfloat16 and pass --compute_dtype int8 at test time."
            )
        max_epoch = max_epoch if max_epoch is not None else cfg.max_epoch
        train_loader, val_loader, val_dataset = self.make_loaders()
        if self.params is None:
            sample = next(iter(train_loader))
            self.initialize(sample, resume=resume)
        # Resume must not regress ckpt_best: seed the best-so-far RMS
        # from the run's own metrics history, so a resumed run only
        # overwrites ckpt_best on a genuine all-time improvement.
        best_rms = self._historical_best_rms() if self.start_epoch else float("inf")
        try:
            for epoch in range(self.start_epoch, max_epoch):
                train_loader.dataset.set_epoch(epoch)
                self.train_one_epoch(train_loader, epoch)
                _, rms = self.eval_one_epoch(val_loader, val_dataset, epoch)
                periodic = (
                    epoch % cfg.checkpoint_every == 0 or epoch == max_epoch - 1
                )
                improved = np.isfinite(rms) and rms < best_rms
                if improved:
                    best_rms = rms
                if periodic or improved:
                    self.save_checkpoint(epoch, periodic=periodic, best=improved)
        finally:
            # The final (or in-flight) write must land on disk and any
            # background write error must surface even if the loop
            # raised — otherwise a mid-training exception silently
            # loses the pending checkpoint.
            self._ckpt_writer.wait()
        self.rundir.close()
        return self.params, self.state
