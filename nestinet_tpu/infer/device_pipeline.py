"""Fully device-resident streaming inference.

The host path (`predict.py`) extracts patches with the kd-tree engine
and uploads [B, S*N, 3] patch tensors per batch.  Here the SHAPE CLOUD
is uploaded once, hashed into per-radius grids on device
(`ops/ball_query.py`), and each step runs ONE compiled program:

    query points [B, 3] -> grid ball query -> patch gather/center/scale
    -> MuPS -> CNN forward -> normals (+ expert outputs)

Per step the host sends a [B, 3] query slice (~3 KB) instead of
multi-MB patch tensors, and the kd-tree never runs on the host — the
SURVEY §7 "north star" path for streaming scans.

Neighbor-selection parity: the reference randomly subsamples balls
larger than `points_per_patch` (`pcpnet_dataset.py:319-321`), a fresh
independent draw per patch.  The ball query does the same on device: a
per-(batch, scale) seed hashes every (query, candidate) pair and top-k
over those keys draws a uniform k-subset per query
(`ops/ball_query.py::_ball_query_sorted`).  The per-shape pre-shuffle
stays as defense-in-depth for the rare cell whose occupancy exceeds the
capacity cap (capped cells truncate candidates in storage order).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

import os

from ..data.pcpnet import _load_cached
from ..models.experts import ExpertsNormEst
from ..ops.ball_query import build_grid, extract_patches, window_occupancy_np
from .predict import (
    SparseMoeRouter,
    _PhaseTimer,
    _pad_batch,
    _serving_jit,
    load_run,
    restore_model,
)
from .writer import AsyncShapeWriter, ShapeScatterWriter


def _mesh_placers(mesh):
    """(put_q, place_grids): query-batch upload (sharded over the data
    axis when a mesh is given) and grid placement (replicated over the
    mesh — every shard extracts from the full cloud)."""
    if mesh is None:
        return jnp.asarray, lambda grids: grids
    from ..train.mesh import batch_sharding, replicated

    q_sh = batch_sharding(mesh)
    r_sh = replicated(mesh)

    def put_q(x):
        return jax.device_put(jnp.asarray(x), q_sh)

    def place_grids(grids):
        return [jax.device_put(g, r_sh) for g in grids]

    return put_q, place_grids


def _capacity_bucket(occ: int) -> int:
    """Round 3x3x3-window occupancy up to a lane-tile multiple (128,
    floor 64) — the CSR lane budget is padded to this bucket.

    Rounds 3-4 used power-of-two buckets; gather width, distance tests,
    draw keys and the top_k all scale linearly with the lane budget, so
    the pow2 slack was real device time (bench fixture: occupancy
    268 -> cap 512 instead of 384, 805 -> 1024 instead of 896).
    128-granularity matches the TPU's lane-tile size, keeps one
    compiled program per dataset (caps are dataset-wide maxima), and
    the outputs are bit-identical — extra lanes beyond the window
    population are masked, never selected."""
    if occ <= 64:
        return 64
    return ((occ + 127) // 128) * 128


def _dataset_window_caps(clouds, radii_frac) -> tuple:
    """Per-radius CSR lane budgets covering EVERY shape in the run.

    The caps are static jit arguments: sizing them per shape keys a
    fresh compiled program per shape, and through the remote-TPU relay
    each flagship serving compile costs minutes — measured 110
    patches/s end-to-end (a ~40x regression) when the caps varied
    across a six-shape testset.  One dataset-wide maximum compiles
    once; the cost is only the 128-granularity bucket slack in
    candidate lanes (`_capacity_bucket`).  Occupancy is computed on the
    host from the raw clouds (`window_occupancy_np` mirrors
    `build_grid` binning bit-for-bit; the per-shape pre-shuffle doesn't
    change cell counts)."""
    worst = [0] * len(radii_frac)
    for cloud in clouds:
        bbdiag = float(np.linalg.norm(cloud.max(0) - cloud.min(0)))
        for i, rf in enumerate(radii_frac):
            occ = window_occupancy_np(cloud, rf * bbdiag)
            worst[i] = max(worst[i], occ)
    return tuple(_capacity_bucket(o) for o in worst)


def make_device_forward(model, n_scales, *, num_point, window_capacity):
    """One jitted program: query points -> patches (per radius) ->
    model forward.  Radii arrive as a traced [n_scales] array so one
    compiled program serves every shape (absolute radii are per-shape:
    fraction x bbox diagonal).  `window_capacity` is either an int
    (shared) or an n_scales tuple of per-radius 3x3x3-window lane
    budgets (CSR candidate layout, `ops/ball_query.py`)."""
    is_moe = isinstance(model, ExpertsNormEst)
    caps = window_capacity if isinstance(window_capacity, tuple) else (
        (window_capacity,) * n_scales
    )

    def fwd(params, state, grids, queries, radii, seed):
        pts_scales, neff_scales = [], []
        for i in range(n_scales):
            p, ne = extract_patches(
                grids[i], queries, radii[i], k=num_point,
                window_capacity=caps[i], center="point",
                seed=seed + jnp.uint32(0x85EBCA6B) * jnp.uint32(i),
            )
            pts_scales.append(p)
            neff_scales.append(ne)
        batch = {
            "points": jnp.concatenate(pts_scales, axis=1),
            "n_eff": jnp.stack(neff_scales, axis=1),
        }
        outputs, _ = model.apply(params, state, None, batch, False, 0.0)
        normals = model.predict_normals(outputs)
        if is_moe:
            experts, probs = model.predict_experts(outputs)
            # Pack into ONE [B, 4+E] array: a remote-TPU fetch costs a
            # ~24 ms round trip regardless of size, so three small
            # fetches per batch would triple the drain latency.
            # predict_experts yields ids [B] and probs [B, E]
            return jnp.concatenate(
                [normals, experts[:, None].astype(jnp.float32), probs],
                axis=1,
            )
        return normals

    return jax.jit(fwd), is_moe


def make_device_manager_store(model, n_scales, *, num_point, window_capacity):
    """Sparse-mode program A with on-device extraction fused in front:
    query points -> ball-query patch gather (per radius) -> MuPS grid ->
    manager probs, parking the grid in the routing FIFO (donated).

    `window_capacity`: int (shared) or per-radius tuple of CSR lane
    budgets — sized to the real 3x3x3-window population per radius
    (`max_window_occupancy`), not 27 x the worst single cell; this keeps
    the gather/top_k width proportional to actual ball candidates
    (per-cell caps before this: 31 -> 24 ms; CSR windows: 11.5 ms for
    all 3 radii at B=256 — docs/PERF.md "Round 4: program-A stage
    split")."""
    caps = window_capacity if isinstance(window_capacity, tuple) else (
        (window_capacity,) * n_scales
    )

    def manager_store(params, state, grids, queries, radii, seed, buf, slot):
        pts_scales, neff_scales = [], []
        for i in range(n_scales):
            p, ne = extract_patches(
                grids[i], queries, radii[i], k=num_point,
                window_capacity=caps[i], center="point",
                seed=seed + jnp.uint32(0x85EBCA6B) * jnp.uint32(i),
            )
            pts_scales.append(p)
            neff_scales.append(ne)
        grid = model._mups_grid(
            jnp.concatenate(pts_scales, axis=1),
            jnp.stack(neff_scales, axis=1),
        ).astype(model.compute_dtype)
        probs = model.apply_manager_on_grid(params, state, grid)
        buf = jax.lax.dynamic_update_slice_in_dim(
            buf, grid.reshape(grid.shape[0], -1)[None], slot, axis=0
        )
        return probs, buf

    return jax.jit(manager_store, donate_argnums=(6,))


def predict_shapes_device(
    run_dir: str,
    *,
    dataset_name: str = "pcpnet_device",
    testset: str = "testset.txt",
    data_path: str | None = None,
    batch_size: int = 256,
    loader_workers: int = 0,  # unused; kept for signature parity
    output_dir: str | None = None,
    seed: int = 3627473,
    compute_dtype: str | None = None,
    moe_inference: str = "sparse",
    sparse_window_slots: int | None = None,
    sparse_patches: bool = False,
    data_parallel: int = 0,
    fold_bn: bool | None = None,
) -> dict:
    """Streaming inference with on-device patch extraction.

    Every point of every shape in `testset`, in order, like the host
    path; writes the same `.normals` (+ `.experts`/`.experts_probs`)
    files.  With `sparse_patches`, only each shape's `.pidx` subset is
    queried (the reference's sparse-eval protocol,
    `test_n_est_w_experts.py:109-116`) and outputs hold one row per
    pidx entry, like the host loader's sparse mode.

    moe_inference: "sparse" (default) fuses extraction + MuPS + manager
    into program A and runs each patch through only its argmax expert
    via the routing FIFO (`SparseMoeRouter`) — outputs identical to
    dense; "dense" runs all experts in the single fused program.

    data_parallel > 1 runs the whole pipeline over a data mesh: the
    shape cloud/grids and parameters are replicated, the query batch
    (and the routing FIFO's batch axis) shard over the mesh — patches
    are independent, so extraction + MuPS + manager need no collectives
    at all (SURVEY §2.7 TPU-equivalent #1).  batch_size must divide by
    it; outputs are identical to single-device
    (`tests/test_device_pipeline.py::test_device_data_parallel_matches_single`).
    """
    del loader_workers
    rd, cfg, gmm, model = load_run(
        run_dir, compute_dtype=compute_dtype, fold_bn=fold_bn
    )
    indir = data_path if data_path is not None else cfg.data_path
    out_dir = output_dir if output_dir is not None else rd.results_dir(dataset_name)

    mesh = None
    if data_parallel > 1:
        from ..train.mesh import make_mesh

        assert batch_size % data_parallel == 0, (
            "batch_size must divide by data_parallel"
        )
        mesh = make_mesh(data_parallel, 1)

    with open(f"{indir}/{testset}") as f:
        shape_names = [s.strip() for s in f if s.strip()]

    clouds = [
        _load_cached(f"{indir}/{name}.xyz", np.float32) for name in shape_names
    ]
    queries_per_shape = [None] * len(clouds)
    if sparse_patches:
        queries_per_shape = [
            _load_cached(f"{indir}/{name}.pidx", np.int64).astype(np.int64)
            for name in shape_names
        ]
    counts = [
        c.shape[0] if q is None else q.shape[0]
        for c, q in zip(clouds, queries_per_shape)
    ]
    inner_writer = ShapeScatterWriter(
        out_dir, shape_names, counts,
        n_experts=cfg.n_experts if cfg.model == "experts_n_est" else None,
    )
    writer = AsyncShapeWriter(inner_writer)

    # restore once with a representative padded batch
    sample_pts = np.zeros(
        (batch_size, len(cfg.patch_radius) * cfg.num_point, 3), np.float32
    )
    sample = {
        "points": sample_pts,
        "n_eff": np.full((batch_size, len(cfg.patch_radius)), cfg.num_point,
                         np.int32),
    }
    params, state = restore_model(rd, cfg, model, sample, mesh=mesh)
    put_q, place_grids = _mesh_placers(mesh)

    rng = np.random.RandomState(seed)
    if isinstance(model, ExpertsNormEst) and moe_inference == "sparse":
        return _predict_sparse_device(
            model, params, state, cfg, writer, clouds, rng,
            batch_size=batch_size, out_dir=out_dir,
            window_slots=sparse_window_slots,
            queries_per_shape=queries_per_shape,
            mesh=mesh, put_q=put_q, place_grids=place_grids,
        )
    n_patches = 0
    n_scales = len(cfg.patch_radius)
    caps = _dataset_window_caps(clouds, cfg.patch_radius)
    fwd, is_moe = _serving_jit(
        model,
        f"device_fwd3_n{cfg.num_point}_s{n_scales}_w{caps}",
        lambda: make_device_forward(
            model, n_scales, num_point=cfg.num_point,
            window_capacity=caps,
        ),
    )
    t0 = time.perf_counter()
    for name, cloud, qidx in zip(shape_names, clouds, queries_per_shape):
        bbdiag = float(np.linalg.norm(cloud.max(0) - cloud.min(0)))
        radii_abs = [r * bbdiag for r in cfg.patch_radius]

        # pre-shuffle: defense-in-depth for capacity-capped cells (see
        # module doc; uniform subsampling itself is the seeded draw)
        perm = rng.permutation(cloud.shape[0])
        shuffled = jnp.asarray(cloud[perm], jnp.float32)
        grids = place_grids([build_grid(shuffled, r) for r in radii_abs])
        radii_dev = jnp.asarray(radii_abs, jnp.float32)
        shape_salt = rng.randint(0, 2**31)
        qpts = cloud if qidx is None else cloud[qidx]

        pending = None

        def drain(p):
            real, outs = p
            if is_moe:
                packed = np.asarray(outs)[:real]
                writer.append(
                    packed[:, :3],
                    packed[:, 3].astype(np.int64),
                    packed[:, 4:],
                )
            else:
                writer.append(np.asarray(outs)[:real])

        for start in range(0, qpts.shape[0], batch_size):
            q = qpts[start : start + batch_size].astype(np.float32)
            real = q.shape[0]
            if real < batch_size:
                q = np.concatenate(
                    [q, np.zeros((batch_size - real, 3), np.float32)]
                )
            # fresh uniform ball draw per batch, deterministic per run
            bseed = jnp.uint32((shape_salt + start) & 0xFFFFFFFF)
            outs = fwd(params, state, grids, put_q(q), radii_dev, bseed)
            try:  # start the device->host copy behind the next dispatch
                outs.copy_to_host_async()
            except Exception:
                pass
            if pending is not None:
                drain(pending)
            pending = (real, outs)
            n_patches += real
        if pending is not None:
            drain(pending)
    writer.close()
    elapsed = time.perf_counter() - t0

    assert inner_writer.done, "writer did not consume all shapes"
    return {
        "n_patches": n_patches,
        "seconds": elapsed,
        "patches_per_sec": n_patches / elapsed if elapsed > 0 else float("inf"),
        "shapes": inner_writer.written,
        "output_dir": out_dir,
    }


def _predict_sparse_device(
    model, params, state, cfg, writer, clouds, rng, *,
    batch_size: int, out_dir: str, window_slots: int | None = None,
    queries_per_shape=None, mesh=None, put_q=jnp.asarray,
    place_grids=lambda g: g,
) -> dict:
    """Sparse MoE serving with on-device extraction: per batch the host
    uploads only a [B, 3] query slice (~3 KB); program A extracts the
    patches with the grid ball query, computes MuPS + manager probs and
    parks the grid in the routing FIFO; the `SparseMoeRouter` then runs
    each patch through exactly one expert (program B) — neither the
    kd-tree nor any patch tensor ever touches the host.  This composes
    the two serving optimizations that individually beat the reference
    path (device extraction; argmax-only routing) and removes the
    1-core host extraction ceiling (~3k patches/s) from the loop."""
    trace = _PhaseTimer(os.environ.get("NESTINET_SERVING_TRACE") == "1")
    router = SparseMoeRouter(
        model, params, state, cfg, writer, batch_size,
        window_slots=window_slots, trace=trace, mesh=mesh,
    )
    if queries_per_shape is None:
        queries_per_shape = [None] * len(clouds)
    n_scales = len(cfg.patch_radius)
    caps = _dataset_window_caps(clouds, cfg.patch_radius)
    mgr = _serving_jit(
        model,
        f"device_manager_store3_n{cfg.num_point}_s{n_scales}_w{caps}",
        lambda: make_device_manager_store(
            model, n_scales, num_point=cfg.num_point,
            window_capacity=caps,
        ),
    )
    t0 = time.perf_counter()
    for cloud, qidx in zip(clouds, queries_per_shape):
        bbdiag = float(np.linalg.norm(cloud.max(0) - cloud.min(0)))
        radii_abs = [r * bbdiag for r in cfg.patch_radius]

        # pre-shuffle: defense-in-depth for capacity-capped cells
        perm = rng.permutation(cloud.shape[0])
        shuffled = jnp.asarray(cloud[perm], jnp.float32)
        with trace("grid_build"):
            grids = place_grids([build_grid(shuffled, r) for r in radii_abs])
        radii_dev = jnp.asarray(radii_abs, jnp.float32)
        shape_salt = rng.randint(0, 2**31)
        qpts = cloud if qidx is None else cloud[qidx]

        for start in range(0, qpts.shape[0], batch_size):
            q = qpts[start : start + batch_size].astype(np.float32)
            real = q.shape[0]
            if real < batch_size:
                q = np.concatenate(
                    [q, np.zeros((batch_size - real, 3), np.float32)]
                )
            slot = router.begin_batch()
            bseed = jnp.uint32((shape_salt + start) & 0xFFFFFFFF)
            with trace("manager_dispatch"):
                probs_dev, buf = mgr(
                    params, state, grids, put_q(q), radii_dev, bseed,
                    router.buf, slot,
                )
            router.commit(real, probs_dev, buf)
    return router.finish(t0, out_dir)
