"""Streaming whole-shape inference.

Parity with `test_n_est_w_experts.py` / `test_n_est.py`: reload the run
directory's config + GMM + checkpoint, walk every point of every test
shape in order ('full' sampler), zero-pad the final partial batch to the
static batch size, and scatter outputs into `<shape>.normals`
(+ `.experts`, `.experts_probs` for the MoE model).
"""

from __future__ import annotations

import contextlib
import os
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
from .writer import AsyncShapeWriter, ShapeScatterWriter


# Process-level caches.  Serving entry points (predict_shapes,
# predict_shapes_device) are called repeatedly by long-running servers
# and by bench.py; without these, every call rebuilds the model
# (re-tracing and RE-COMPILING all jitted programs — minutes through a
# remote-TPU tunnel whose compile cache does not persist) and re-reads +
# re-uploads the multi-GB checkpoint.  Keys carry file mtimes so an
# updated run dir or checkpoint invalidates naturally.
_RUN_CACHE: dict = {}
_RESTORE_CACHE: dict = {}


class _PhaseTimer:
    """Opt-in host-side phase accounting for the serving loops
    (`NESTINET_SERVING_TRACE=1`): accumulates wall time per named phase
    so the per-batch budget — program dispatch vs device->host
    materialization vs host bookkeeping — is measured on the *real*
    serving path rather than a synthetic probe.  Near-zero overhead when
    disabled (a single attribute check per phase)."""

    def __init__(self, enabled: bool):
        self.enabled = enabled
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + (
                time.perf_counter() - t0
            )
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, n_batches: int) -> dict:
        return {
            "phases_ms_total": {k: round(v * 1e3, 2) for k, v in self.totals.items()},
            "phases_ms_per_batch": {
                k: round(v * 1e3 / max(n_batches, 1), 3)
                for k, v in self.totals.items()
            },
            "phase_counts": dict(self.counts),
        }


def _mesh_key(mesh):
    if mesh is None:
        return None
    return (
        tuple(mesh.axis_names),
        tuple(mesh.devices.shape),
        tuple(d.id for d in mesh.devices.flat),
    )


def load_run(
    run_dir: str,
    compute_dtype: str | None = None,
    fold_bn: bool | None = None,
):
    """(cfg, gmm, model, params, state) from a run directory.

    Cached per (path, config/gmm mtime, dtype override): the returned
    model object owns the jitted serving programs, so reusing it across
    calls reuses the compiled executables.

    `compute_dtype` overrides the training config's CNN compute dtype
    for serving only — parameters are stored in float32 regardless of
    compute dtype (mixed precision, `ops/nn.py`), so one checkpoint can
    be served at float32 or bfloat16 without conversion.

    `fold_bn` overrides cfg.fold_bn for serving (ops/fold.py: eval BN
    affines folded into the kernels at checkpoint load)."""
    rd = RunDir.open(run_dir)
    path = os.path.abspath(run_dir)
    key = (
        path,
        os.path.getmtime(rd.config_path),
        os.path.getmtime(rd.gmm_path),
        compute_dtype,
        fold_bn,
    )
    hit = _RUN_CACHE.get(key)
    if hit is not None:
        return hit
    # Evict stale entries for the same run dir + dtype: an updated
    # config/gmm means the old model object (and its compiled serving
    # programs) will never be used again — without eviction a
    # long-lived server leaks one model per reload.
    for stale in [
        k
        for k in _RUN_CACHE
        if k[0] == path and k[3] == compute_dtype and k[4] == fold_bn
    ]:
        del _RUN_CACHE[stale]
    cfg = Config.load(rd.config_path)
    gmm = GridGMM.load(rd.gmm_path)
    import dataclasses

    if compute_dtype is not None:
        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    if fold_bn is not None:
        cfg = dataclasses.replace(cfg, fold_bn=bool(fold_bn))
    model = build_model(cfg, gmm)
    _RUN_CACHE[key] = (rd, cfg, gmm, model)
    return _RUN_CACHE[key]


def _serving_jit(model, name: str, make):
    """Jitted serving programs live on the model object (itself cached
    by load_run), so re-entering a serving loop reuses the compiled
    executable instead of re-tracing a fresh jax.jit wrapper."""
    jits = getattr(model, "_serving_jits", None)
    if jits is None:
        jits = model._serving_jits = {}
    if name not in jits:
        jits[name] = make()
    return jits[name]


def restore_model(rd: RunDir, cfg: Config, model, sample_batch: dict, mesh=None):
    """Init templates and restore the checkpoint.

    With a mesh, parameters/state are placed replicated over it (the
    batch axis carries the data parallelism at inference)."""
    from ..train.mesh import replicated
    from ..train.train_step import make_optimizer

    import json

    # Serving prefers the best-validation checkpoint when the trainer
    # wrote one (resume-training always uses the last `ckpt/`).
    ckpt_dir = rd.ckpt_dir
    best = rd.ckpt_best_dir
    if os.path.exists(os.path.join(best, ckpt_lib.META_NAME)):
        ckpt_dir = best
    # Key on the checkpoint's *content identity* — (step, epoch, file)
    # from the meta JSON plus the blob's size and mtime — not on the
    # meta file's mtime alone: coarse (1 s) filesystem mtime granularity
    # would otherwise serve stale weights for a checkpoint overwritten
    # within the same second.
    ckpt_meta = os.path.join(ckpt_dir, ckpt_lib.META_NAME)
    with open(ckpt_meta) as f:
        meta = json.load(f)
    blob = os.path.join(ckpt_dir, meta["file"])
    blob_stat = os.stat(blob)
    prefix = (id(model), ckpt_dir, _mesh_key(mesh))
    cache_key = prefix + (
        meta["step"], meta["epoch"], meta["file"],
        blob_stat.st_size, blob_stat.st_mtime_ns,
    )
    hit = _RESTORE_CACHE.get(cache_key)
    if hit is not None:
        return hit
    # Evict entries for the same (model, ckpt_dir, mesh): each holds a
    # full device-resident params+state copy (~GBs for the flagship);
    # without eviction a server that reloads updated checkpoints leaks
    # device memory per update until OOM.
    for stale in [k for k in _RESTORE_CACHE if k[: len(prefix)] == prefix]:
        del _RESTORE_CACHE[stale]

    rng = jax.random.PRNGKey(cfg.seed)
    batch = {k: jnp.asarray(v) for k, v in sample_batch.items()}
    # Templates as abstract shapes: eval_shape traces init without
    # running it, so no initialized parameters are ever computed on (or
    # fetched from) the device just to learn the tree structure — the
    # fetch alone costs minutes for the 178M-param flagship through a
    # remote-TPU tunnel.
    params_t, state_t = jax.eval_shape(model.init, rng, batch)
    opt_t = jax.eval_shape(make_optimizer(cfg).init, params_t)
    params, state, _, _, _ = ckpt_lib.restore(
        ckpt_dir, params=params_t, state=state_t, opt_state=opt_t
    )
    if getattr(model, "fold_bn", False):
        # BN-folded serving: eval BN affines folded into the preceding
        # conv/linear kernels on the host (exact algebra — ops/fold.py);
        # model.quant_ctx() then skips the BN layers at trace time.
        # Must precede quantization (folds float32 kernels).
        from ..ops.fold import fold_bn_params_np

        params, state = fold_bn_params_np(params, state)
    if getattr(model, "quantize", False):
        # int8 serving: pre-quantize conv/linear kernels on the host —
        # the device then holds int8 weights + per-cout scales instead
        # of re-deriving them from f32 every call, and the upload below
        # ships ~1 byte/param instead of 4 (ops/quant.py).
        from ..ops.quant import quantize_params_np

        params = quantize_params_np(params)
    # Restore yields host arrays; move them to device NOW, explicitly.
    # Leaving the transfer to the first jit dispatch ships hundreds of
    # MB inside the dispatch path — observed to wedge the remote-TPU
    # (axon) client when combined with a pending compile request.
    if mesh is not None:
        sh = replicated(mesh)
        params = jax.device_put(params, jax.tree.map(lambda _: sh, params))
        state = jax.device_put(state, jax.tree.map(lambda _: sh, state))
    else:
        params = jax.device_put(params)
        state = jax.device_put(state)
    jax.block_until_ready((params, state))
    _RESTORE_CACHE[cache_key] = (params, state)
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
    moe_inference: str = "sparse",
    data_parallel: int = 0,
    compute_dtype: str | None = None,
    sparse_window_slots: int | None = None,
    fold_bn: bool | None = None,
) -> dict:
    """Run inference for every shape in `testset`; returns stats.

    moe_inference: "sparse" (default) routes each patch through MuPS +
    manager + ONLY its argmax expert via on-device routing (~2.3x fewer
    FLOPs, same outputs) — the measured-fastest mode in both dtypes now
    that the grid FIFO keeps routing on device (r2: sparse 2019 vs
    dense 1646 patches/s at f32; 2826 vs 1895 at bf16, B=256).
    "dense" runs all experts in one compiled program like the reference
    (`test_n_est_w_experts.py:148-152`).

    data_parallel > 1 builds a data mesh and shards every batch's
    leading axis across it (params replicated); batch_size must divide
    by it.

    compute_dtype overrides the CNN compute dtype for this serving pass
    ("bfloat16" serves a float32 checkpoint in mixed precision).
    """
    rd, cfg, gmm, model = load_run(
        run_dir, compute_dtype=compute_dtype, fold_bn=fold_bn
    )
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

    mesh = None
    if data_parallel > 1:
        from ..train.mesh import make_mesh

        assert batch_size % data_parallel == 0, (
            "batch_size must divide by data_parallel"
        )
        mesh = make_mesh(data_parallel, 1)

    sample = next(iter(loader))
    params, state = restore_model(
        rd, cfg, model, _pad_batch(sample, batch_size), mesh=mesh
    )

    if is_moe and moe_inference == "sparse":
        return _predict_sparse_moe(
            model, params, state, loader, dataset, cfg, out_dir, batch_size,
            mesh=mesh, window_slots=sparse_window_slots,
        )

    def _make_fwd():
        def fwd(params, state, batch):
            outputs, _ = model.apply(params, state, None, batch, False, 0.0)
            normals = model.predict_normals(outputs)
            if is_moe:
                # Pack into ONE [B, 4+E] array: a remote-TPU fetch costs
                # a ~24 ms round trip regardless of size, so one fetch
                # per batch instead of three.
                experts, probs = model.predict_experts(outputs)
                return jnp.concatenate(
                    [normals, experts[:, None].astype(jnp.float32), probs],
                    axis=1,
                )
            return normals

        return jax.jit(fwd)

    fwd = _serving_jit(model, "dense_fwd", _make_fwd)

    inner_writer = ShapeScatterWriter(
        out_dir,
        dataset.shape_names,
        dataset.shape_patch_count,
        n_experts=cfg.n_experts if is_moe else None,
    )
    writer = AsyncShapeWriter(inner_writer)

    def _drain(pending):
        """Materialize a dispatched batch's outputs into the writer.
        The np.asarray is the synchronizing device fetch and stays on
        this thread; the scatter/savetxt runs on the writer thread."""
        real, outs = pending
        if is_moe:
            packed = np.asarray(outs)[:real]
            writer.append(
                packed[:, :3],
                packed[:, 3].astype(np.int64),
                packed[:, 4:],
            )
        else:
            writer.append(np.asarray(outs)[:real])

    # One-deep software pipeline: jax dispatch is async, so batch i
    # computes on the TPU while the host loader extracts patches for
    # i+1 and the writer scatters i-1 (the reference ran these three
    # strictly serially each step, `test_n_est_w_experts.py:129-197`).
    n_patches = 0
    n_batches = 0
    pending = None
    trace = _PhaseTimer(os.environ.get("NESTINET_SERVING_TRACE") == "1")
    t0 = time.perf_counter()
    put = _make_put(mesh)
    _end = object()
    batch_iter = iter(loader)
    while True:
        with trace("loader_wait"):
            batch = next(batch_iter, _end)
        if batch is _end:
            break
        real = batch["points"].shape[0]
        batch = _pad_batch(batch, batch_size)
        with trace("upload"):
            device_batch = {
                "points": put(batch["points"]),
                "n_eff": put(batch["n_eff"]),
            }
        with trace("fwd_dispatch"):
            outs = fwd(params, state, device_batch)
        try:  # start the device->host copy behind the next dispatch
            outs.copy_to_host_async()
        except Exception:
            pass
        if pending is not None:
            with trace("drain"):
                _drain(pending)
        pending = (real, outs)
        n_patches += real
        n_batches += 1
    if pending is not None:
        _drain(pending)
    writer.close()
    elapsed = time.perf_counter() - t0

    assert inner_writer.done, "writer did not consume all shapes"
    stats = {
        "n_patches": n_patches,
        "seconds": elapsed,
        "patches_per_sec": n_patches / elapsed if elapsed > 0 else float("inf"),
        "shapes": inner_writer.written,
        "output_dir": out_dir,
    }
    if trace.enabled:
        stats.update(trace.report(n_batches))
    return stats


def _make_put(mesh):
    """Batch-upload function: plain device_put, or sharded over the
    mesh's data axis."""
    if mesh is None:
        return jnp.asarray
    from ..train.mesh import batch_sharding

    sh = batch_sharding(mesh)
    return lambda v: jax.device_put(np.asarray(v), sh)


class SparseMoeRouter:
    """On-device argmax-only MoE routing with a grid FIFO (VERDICT r1 #4).

    Round-1's host-side bucketing re-uploaded the bucketed points and
    recomputed MuPS per expert pass, which cost more than the skipped
    expert FLOPs saved (sparse 608 vs dense 1664 patches/s).  Redesign:

      * Program A (built by the CALLER — host path: MuPS+manager on an
        uploaded patch batch; device path: ball-query extraction fused
        in front): computes the MuPS grid and manager probs and parks
        the grid in slot `i % W` of a device-resident FIFO buffer
        `self.buf [W, B, r, r, r, C]` (donated, so the update is
        in-place).
      * Host (this class): fetch ONLY the [E, B] probs (DEPTH-deep
        pipeline), argmax, and bucket flat FIFO indices per winning
        expert — no patch data moves host->device again.
      * Program B (`expert_on_buf`, one per architecture group): gather
        the bucketed rows from the FIFO, dynamic-slice the group's MuPS
        channels, run the single argmax expert -> normals [B, 3].

    Each patch's grid is computed exactly once and each patch runs
    through exactly one expert — FLOP-optimal routing with only index
    uploads and tiny prob/normal fetches on the wire.  Buckets are
    force-flushed (padded with index 0; outputs ignored) before their
    FIFO slot is overwritten, bounding staleness to W batches.  Outputs
    are bit-identical to the dense path: same grid numerics, same
    expert math, same first-max argmax tie-breaking on the same f32
    probabilities (`test_n_est_w_experts.py:148-152`).

    Driver protocol, per batch:

        slot = router.begin_batch()           # evicts the wrapping slot
        probs_dev, new_buf = program_a(..., router.buf, slot)
        router.commit(real, probs_dev, new_buf)

    then once: `stats = router.finish(t0)`.
    """

    def __init__(self, model, params, state, cfg, writer, batch_size,
                 window_slots: int | None = None, trace=None, mesh=None):
        import functools

        self.model = model
        self.params = params
        self.state = state
        self.writer = writer
        self.batch_size = batch_size
        self.trace = trace if trace is not None else _PhaseTimer(False)
        res = model.resolution
        grid_shape = (res, res, res, 20 * cfg.n_scales)
        # ~8k parked grids: large enough that 256-patch buckets fill
        # before eviction for 7 experts (73 forced flushes -> 2 on the
        # bench set; 2603 -> 2826 patches/s), small enough that the
        # donated FIFO stays moderate at bf16 (64 slots x 256 measured
        # SLOWER — HBM pressure).
        # W >= 2 is a correctness floor, not a tuning choice: at W=1 the
        # slot written by batch i is evicted-and-overwritten before the
        # depth-delayed manager drain ever buckets batch i's entries, so
        # every expert would read the WRONG grid (silently).
        self.W = max(2, window_slots) if window_slots else max(
            2, 8192 // batch_size
        )
        self.expert_fns = {
            gi: _serving_jit(
                model,
                f"expert_on_buf_{gi}",
                lambda gi=gi: jax.jit(
                    functools.partial(_expert_on_buf, model, group_index=gi)
                ),
            )
            for gi in range(len(model.groups))
        }
        self.table = model.expert_to_group()

        # Host bookkeeping is vectorized per BATCH, not per patch: the
        # per-patch dict/list protocol of rounds 1-3 measured ~8 ms of
        # untraced pure-python time per 512-batch on this 1-core host
        # (~15 µs/patch).  Buckets hold (idxs, flats, b_idx) numpy
        # SEGMENTS — one per (batch, winning expert) — and completed
        # normals land in a fixed ring indexed by global patch id, so
        # the in-order emit is ring slicing instead of dict pops.
        self.buckets = {e: [] for e in range(model.n_experts)}
        self.bucket_count = {e: 0 for e in range(model.n_experts)}
        # per-batch emit metadata, in batch order: [base, real, experts
        # [real], probs [E, real]] — consumed as emit_ptr passes it.
        self.emit_meta: list = []
        self.emit_ptr = 0
        self.n_patches = 0
        self.batch_i = 0  # batches dispatched through program A
        self.forced_flushes = 0
        self.expert_pending: list[tuple[np.ndarray, object]] = []
        self.manager_queue: list[tuple] = []
        # Manager results are consumed DEPTH batches behind dispatch, so
        # by the time probs[i] is materialized on host its device->host
        # copy (~30 ms relay round trip) has fully overlapped the
        # compute of batches i+1..i+DEPTH; one-deep (round 1) still
        # exposed most of the round trip because fetch(i) only
        # overlapped dispatch(i+1).  DEPTH must stay <= W-2 so bucket
        # entries exist before their slot is evicted; 3 covers the
        # relay RTT at measured compute times.  Effective FIFO lifetime
        # shrinks to W - depth batches, so keep depth well under W.
        depth_env = int(os.environ.get("NESTINET_MANAGER_DEPTH", "3"))
        self.depth = min(depth_env, self.W - 2) if self.W > 2 else 1

        # Completed-normals ring: covers every patch that can be in
        # flight at once — W FIFO batches + the manager-depth queue +
        # the expert in-flight window (<=12 runs) — with slack.  A
        # fixed ring makes completion a vectorized scatter and emit a
        # contiguous slice; `_drain_expert_pending(0)` is forced if a
        # write would ever lap the unread tail (can't happen at these
        # sizes, asserted anyway).
        self.R = (self.W + self.depth + 28) * batch_size
        self.ring = np.zeros((self.R, 3), np.float32)
        self.ready = np.zeros(self.R, bool)

        # FIFO rows are stored FLAT ([W, B, res^3 * C]) rather than in
        # grid shape: the last dim then tiles perfectly onto (8, 128)
        # lanes, where a [..., res, res, res, C] layout pads C (60) up
        # to 128 lanes — 2.1x the HBM and a padded gather whose
        # pad-clamp fusion blows the 16 MB scoped-VMEM limit.
        row_len = int(np.prod(grid_shape))
        buf = jnp.zeros((self.W, batch_size, row_len), model.compute_dtype)
        if mesh is not None:
            # Data-parallel serving: shard the FIFO's batch axis over the
            # data mesh so program A's parked grids stay on the shard
            # that computed them.  Program B's flat-index row gather then
            # crosses shards only for bucket rows that landed elsewhere
            # (XLA inserts the collective); outputs stay identical.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..train.mesh import DATA_AXIS

            buf = jax.device_put(buf, NamedSharding(mesh, P(None, DATA_AXIS)))
            self.buf = jax.block_until_ready(buf)
        else:
            self.buf = jax.block_until_ready(jax.device_put(buf))

    def begin_batch(self):
        """Evict the slot about to be overwritten; returns it (traced)."""
        if self.batch_i >= self.W:
            with self.trace("evict"):
                self._evict_slot(self.batch_i % self.W)
        return jnp.asarray(self.batch_i % self.W, jnp.int32)

    def commit(self, real: int, probs_dev, new_buf):
        """Record a dispatched program-A batch and advance the pipeline."""
        self.buf = new_buf
        try:
            probs_dev.copy_to_host_async()
        except Exception:
            pass
        self.manager_queue.append((self.batch_i, real, probs_dev))
        while len(self.manager_queue) > self.depth:
            self._process_manager(self.manager_queue.pop(0))
        self.batch_i += 1

    def finish(self, t0: float, out_dir: str) -> dict:
        while self.manager_queue:
            self._process_manager(self.manager_queue.pop(0))
        for e in self.buckets:  # flush partial buckets
            while self.bucket_count[e]:
                idxs, flats = self._take(
                    e, min(self.bucket_count[e], self.batch_size)
                )
                self._run_rows(e, idxs, flats)
        self._drain_expert_pending(0)
        self._emit()
        inner = self.writer
        if hasattr(inner, "close"):  # AsyncShapeWriter: drain + join
            with self.trace("writer_close"):
                inner.close()
            inner = inner.writer
        elapsed = time.perf_counter() - t0

        assert inner.done, "writer did not consume all shapes"
        stats = {
            "n_patches": self.n_patches,
            "seconds": elapsed,
            "patches_per_sec": (
                self.n_patches / elapsed if elapsed > 0 else float("inf")
            ),
            "shapes": inner.written,
            "output_dir": out_dir,
            "forced_flushes": self.forced_flushes,
            "window_slots": self.W,
        }
        if self.trace.enabled:
            # note: `evict` nests the expert dispatches it forces, so
            # phase totals can sum past wall time; read leaves first.
            stats.update(self.trace.report(self.batch_i))
        return stats

    # ---- internals ----
    def _take(self, e: int, n: int):
        """Pop exactly n entries from bucket e's segment list (splitting
        the last segment if needed); returns (idxs [n], flats [n])."""
        segs = self.buckets[e]
        parts_i, parts_f, got = [], [], 0
        while got < n:
            i, f, b = segs[0]
            need = n - got
            if i.shape[0] <= need:
                parts_i.append(i)
                parts_f.append(f)
                segs.pop(0)
                got += i.shape[0]
            else:
                parts_i.append(i[:need])
                parts_f.append(f[:need])
                segs[0] = (i[need:], f[need:], b)
                got = n
        self.bucket_count[e] -= n
        if len(parts_i) == 1:
            return parts_i[0], parts_f[0]
        return np.concatenate(parts_i), np.concatenate(parts_f)

    def _run_rows(self, e: int, idxs: np.ndarray, flats: np.ndarray):
        """Dispatch one program-B run for bucket e over the given flat
        FIFO rows."""
        gi, member = self.table[e]
        n = idxs.shape[0]
        flat = flats.astype(np.int32, copy=False)
        if n < self.batch_size:
            self.forced_flushes += 1
            # Forced flushes (slot eviction, end-of-stream) usually hold
            # far fewer than batch_size entries; padding them to a
            # quarter-size program-B specialization instead of the full
            # one cuts the wasted expert compute ~4x (jit re-specializes
            # per row count, so this costs one extra compile per group).
            small = max(32, self.batch_size // 4)
            target = small if n <= small else self.batch_size
            flat = np.concatenate([flat, np.zeros(target - n, np.int32)])
        with self.trace("expert_dispatch"):
            normals_dev = self.expert_fns[gi](
                self.params, self.state, self.buf, jnp.asarray(flat),
                member=jnp.asarray(member, jnp.int32),
            )
        try:
            normals_dev.copy_to_host_async()
        except Exception:
            pass
        self.expert_pending.append((idxs, normals_dev))
        # In-flight window of bucket runs: outputs are materialized this
        # many runs behind dispatch so the per-run device->host round
        # trip (~30 ms relay floor) overlaps later compute instead of
        # serializing the loop (measured: 2 -> 2659 patches/s ceiling).
        self._drain_expert_pending(
            int(os.environ.get("NESTINET_EXPERT_INFLIGHT", "12"))
        )

    def _drain_expert_pending(self, max_left: int):
        while len(self.expert_pending) > max_left:
            idxs, dev = self.expert_pending.pop(0)
            with self.trace("normals_materialize"):
                normals = np.asarray(dev)
            # vectorized completion scatter into the ring (every idx is
            # un-emitted, so emit_ptr <= idx < emit_ptr + R must hold)
            assert int(idxs.max()) - self.emit_ptr < self.R, (
                "normals ring lapped the unread tail"
            )
            slots = idxs % self.R
            self.ring[slots] = normals[: idxs.shape[0]]
            self.ready[slots] = True

    def _emit(self):
        """Drain the in-order prefix of completed patches to the writer
        (ring slices + per-batch metadata — no per-patch python)."""
        start = self.emit_ptr
        out_n = []
        while self.emit_ptr < self.n_patches:
            s = self.emit_ptr % self.R
            span = min(self.R - s, self.n_patches - self.emit_ptr)
            flags = self.ready[s : s + span]
            k = span if flags.all() else int(np.argmin(flags))
            if k == 0:
                break
            out_n.append(self.ring[s : s + k].copy())
            self.ready[s : s + k] = False
            self.emit_ptr += k
        if not out_n:
            return
        with self.trace("emit_write"):
            normals = out_n[0] if len(out_n) == 1 else np.concatenate(out_n)
            # expert ids + probs for [start, emit_ptr) from the
            # per-batch metadata, consumed front-to-back
            e_parts, p_parts = [], []
            while self.emit_meta:
                base, real, experts, probs = self.emit_meta[0]
                lo = max(base, start)
                hi = min(base + real, self.emit_ptr)
                if hi <= lo:
                    break
                e_parts.append(experts[lo - base : hi - base])
                p_parts.append(probs[:, lo - base : hi - base])
                if hi == base + real:
                    self.emit_meta.pop(0)
                else:
                    break
            e_ids = (
                e_parts[0] if len(e_parts) == 1 else np.concatenate(e_parts)
            )
            probs_rows = np.ascontiguousarray(
                (p_parts[0] if len(p_parts) == 1 else np.concatenate(
                    p_parts, axis=1
                )).T
            )
            self.writer.append(
                normals, e_ids.astype(np.int64), probs_rows
            )

    def _evict_slot(self, slot: int):
        """Flush every bucket segment whose grids live in `slot` BEFORE
        program A overwrites it.  Segments are appended in batch order,
        so slot-matching segments sit at each bucket's head (at most one
        batch occupies a slot — it is evicted before reuse)."""
        for e, segs in self.buckets.items():
            take_i, take_f, taken = [], [], 0
            while segs and segs[0][2] % self.W == slot:
                i, f, _ = segs.pop(0)
                take_i.append(i)
                take_f.append(f)
                taken += i.shape[0]
            if taken:
                self.bucket_count[e] -= taken
                self._run_rows(
                    e,
                    np.concatenate(take_i) if len(take_i) > 1 else take_i[0],
                    np.concatenate(take_f) if len(take_f) > 1 else take_f[0],
                )

    def _process_manager(self, pending):
        # The remote-TPU relay downloads at ~1.5 MB/s with a ~24 ms
        # round-trip floor while uploads run at ~1 GB/s, so every
        # synchronous fetch is a stall; probs are materialized DEPTH
        # batches behind dispatch (see __init__).
        b_idx, real, probs_dev = pending
        with self.trace("probs_materialize"):
            probs = np.asarray(probs_dev)  # [E, batch]
        probs = probs[:, :real]
        experts = np.argmax(probs, axis=0)
        base = self.n_patches
        idxs = base + np.arange(real, dtype=np.int64)
        flats = (b_idx % self.W) * self.batch_size + np.arange(
            real, dtype=np.int32
        )
        self.emit_meta.append((base, real, experts, probs))
        for e in np.unique(experts):
            m = experts == e
            self.buckets[int(e)].append((idxs[m], flats[m], b_idx))
            self.bucket_count[int(e)] += int(m.sum())
        self.n_patches += real
        for e in self.buckets:
            while self.bucket_count[e] >= self.batch_size:
                bi, bf = self._take(e, self.batch_size)
                self._run_rows(e, bi, bf)
        self._emit()


def _predict_sparse_moe(
    model, params, state, loader, dataset, cfg, out_dir, batch_size, mesh=None,
    window_slots: int | None = None,
) -> dict:
    """Host-extraction sparse serving: kd-tree patches are uploaded per
    batch and program A is MuPS + manager + FIFO park (routing machinery
    in `SparseMoeRouter`)."""
    put = _make_put(mesh)
    trace = _PhaseTimer(os.environ.get("NESTINET_SERVING_TRACE") == "1")

    def _make_manager_store():
        def manager_store(params, state, batch, buf, slot):
            grid = model._mups_grid(batch["points"], batch["n_eff"]).astype(
                model.compute_dtype
            )
            probs = model.apply_manager_on_grid(params, state, grid)
            buf = jax.lax.dynamic_update_slice_in_dim(
                buf, grid.reshape(grid.shape[0], -1)[None], slot, axis=0
            )
            return probs, buf

        return jax.jit(manager_store, donate_argnums=(3,))

    manager_fn = _serving_jit(model, "manager_store", _make_manager_store)

    writer = AsyncShapeWriter(ShapeScatterWriter(
        out_dir, dataset.shape_names, dataset.shape_patch_count,
        n_experts=cfg.n_experts,
    ))
    router = SparseMoeRouter(
        model, params, state, cfg, writer, batch_size,
        window_slots=window_slots, trace=trace, mesh=mesh,
    )

    t0 = time.perf_counter()
    _end = object()
    batch_iter = iter(loader)
    while True:
        with trace("loader_wait"):
            batch = next(batch_iter, _end)
        if batch is _end:
            break
        real = batch["points"].shape[0]
        padded = _pad_batch(batch, batch_size)
        slot = router.begin_batch()
        with trace("upload"):
            dev_batch = {
                "points": put(padded["points"]),
                "n_eff": put(padded["n_eff"]),
            }
        with trace("manager_dispatch"):
            probs_dev, buf = manager_fn(
                params, state, dev_batch, router.buf, slot
            )
        router.commit(real, probs_dev, buf)
    return router.finish(t0, out_dir)


def _expert_on_buf(model, params, state, buf, flat_idx, member, *, group_index):
    """Program B: gather bucketed grid rows from the FIFO buffer and run
    one expert (member traced, group static) -> normals [B, 3].

    `buf` holds FLAT grid rows ([W, B, res^3 * C]); the gather runs in
    row chunks (one fused gather of B full rows — B=256 x 122 KB at f32
    = 30 MB — exceeds the TPU's 16 MB scoped-VMEM staging limit), each
    chunk is reshaped to grid form and the group's channel slice taken
    before concatenation."""
    flat = buf.reshape(-1, buf.shape[-1])
    group = model.groups[group_index]
    start = jnp.asarray(group.starts, jnp.int32)[member]
    n = flat_idx.shape[0]
    res = model.resolution
    c_total = 20 * model.cfg.n_scales
    # 64 rows x 122 KB (f32 grid row) = 7.8 MB per staged gather; 2-byte
    # dtypes can take 128 rows within the same budget.
    chunk = 128 if buf.dtype.itemsize <= 2 else 64
    if n % chunk:  # static batch sizes not divisible by the chunk
        lim = chunk
        chunk = 1
        while 2 * chunk <= lim and n % (2 * chunk) == 0:
            chunk *= 2
    idx_blocks = flat_idx.reshape(n // chunk, chunk)

    def take_block(idx):
        rows = jnp.take(flat, idx, axis=0)
        rows = rows.reshape(idx.shape[0], res, res, res, c_total)
        return jax.lax.dynamic_slice_in_dim(rows, start, group.channels, axis=-1)

    g = jax.lax.map(take_block, idx_blocks)
    g = g.reshape((n,) + g.shape[2:])
    return model.apply_expert_member_on_grid_sliced(
        params, state, g, group_index, member
    )


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
