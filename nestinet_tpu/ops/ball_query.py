"""On-device fixed-radius neighborhood search (grid-hash ball query).

The reference extracts patches with a host-side scipy cKDTree, one
query at a time (`pcpnet_dataset.py:304`).  This module does the same
search as ONE compiled XLA program over a whole query batch, with
static shapes throughout — the TPU answer to a spatial index:

  1. hash points into a uniform grid of cell size = radius;
  2. sort points by cell id (device sort), record per-cell
     start/count via a searchsorted over the sorted ids;
  3. per query: visit the 27 neighboring cells, read up to
     `cell_capacity` candidates from each (static cap), mask by true
     distance, and compact the first `k` hits to fixed-size output.

Together with `ops/mups.py` this makes patch extraction + MuPS + CNN a
fully device-resident pipeline: the shape cloud is uploaded once and
only query indices stream afterwards.

Caps and parity:
  * `cell_capacity` bounds points per cell; overflow points are
    dropped from candidate lists (detectable: `build_grid` reports the
    max occupancy so callers can re-build with a larger cap).
  * The reference randomly subsamples when a ball exceeds
    `points_per_patch` and zero-pads below it
    (`pcpnet_dataset.py:319-330`).  With `seed=None` selection here is
    first-k in candidate-lane order — deterministic but spatially
    biased toward the low-offset neighbor cells when the ball is
    oversized.  Passing a `seed` draws a UNIFORM k-subset of the ball
    per query (top-k over per-(query, candidate) hash keys), matching
    the host path's independent `rng.choice` per patch; exact parity
    tests compare SETS of neighbors against scipy either way.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class HashGrid(NamedTuple):
    """A device-resident uniform grid over a point cloud."""

    points: jnp.ndarray  # [M, 3] sorted by cell id
    order: jnp.ndarray  # [M] original indices of the sorted points
    cell_ids: jnp.ndarray  # [M] sorted cell id per point
    origin: jnp.ndarray  # [3] grid origin
    dims: jnp.ndarray  # [3] int32 cells per axis
    cell_size: jnp.ndarray  # [] float cell edge length
    cell_starts: jnp.ndarray  # [max_dim^3 + 1] CSR row table: cell c's
    # points live at sorted rows [cell_starts[c], cell_starts[c+1]).
    # Built once per (shape, radius); turns the per-query-batch cell
    # range lookup into two gathers instead of 2 x 27 x B binary
    # searches over the sorted ids.


def _cell_of(points, origin, cell_size, dims):
    ijk = jnp.floor((points - origin) / cell_size).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, dims - 1)
    return (ijk[..., 0] * dims[1] + ijk[..., 1]) * dims[2] + ijk[..., 2]


@partial(jax.jit, static_argnames=("max_dim",))
def build_grid(points: jnp.ndarray, radius, *, max_dim: int = 64) -> HashGrid:
    """Hash `points` [M, 3] into cells of edge `radius` (device sort).

    `max_dim` caps cells per axis (memory guard for tiny radii); cells
    only get coarser, never incorrect — the query still distance-tests.
    """
    points = points.astype(jnp.float32)
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    radius = jnp.asarray(radius, jnp.float32)
    dims = jnp.minimum(
        jnp.maximum(jnp.ceil((hi - lo) / radius), 1).astype(jnp.int32), max_dim
    )
    cell_size = jnp.maximum((hi - lo) / dims.astype(jnp.float32), radius)
    cell_size = jnp.max(cell_size)  # cubic cells >= radius
    dims = jnp.maximum(
        jnp.ceil((hi - lo) / cell_size).astype(jnp.int32), 1
    )
    ids = _cell_of(points, lo, cell_size, dims)
    order = jnp.argsort(ids)
    ids_sorted = ids[order]
    # Dense CSR row table over the (statically padded) cell-id space:
    # one searchsorted per BUILD instead of 54 per query batch.  Ids at
    # or beyond prod(dims) never occur, so their rows are all M (empty).
    table_ids = jnp.arange(max_dim**3 + 1, dtype=jnp.int32)
    cell_starts = jnp.searchsorted(ids_sorted, table_ids, side="left")
    return HashGrid(
        points=points[order],
        order=order.astype(jnp.int32),
        cell_ids=ids_sorted,
        origin=lo,
        dims=dims,
        cell_size=cell_size,
        cell_starts=cell_starts.astype(jnp.int32),
    )


def _mix32(x):
    """murmur3 fmix32 — a uint32 bijective finalizer with good
    avalanche; used to derive per-(query, candidate) uniform keys."""
    x = jnp.asarray(x, jnp.uint32)
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


@partial(jax.jit, static_argnames=("k", "cell_capacity", "window_capacity"))
def ball_query(
    grid: HashGrid,
    queries: jnp.ndarray,
    radius,
    *,
    k: int,
    cell_capacity: int = 64,
    seed=None,
    window_capacity: int | None = None,
):
    """Fixed-radius neighbors of each query point.

    Args:
        grid: a HashGrid built with cell size >= radius.
        queries: [B, 3].
        radius: search radius (<= grid cell size).
        k: neighbors returned per query (zero-padded).
        cell_capacity: candidates read per neighboring cell.
        seed: optional uint32 scalar; when given, oversized balls are
            subsampled uniformly (independent per query) instead of
            first-k in lane order — the reference's per-patch random
            subsample (`pcpnet_dataset.py:319-321`).
        window_capacity: when given, candidate lanes are CSR-compacted
            across the 27 cells into `window_capacity` lanes per query
            (use `max_window_occupancy(grid)` rounded up) instead of
            27 x cell_capacity lanes sized for the WORST single cell —
            3-7x fewer lanes on the large flagship radii, identical
            results (the hit set and hash keys don't change).  When the
            lane budget is <= k the ball cannot be oversized, so both
            draws degenerate to the same compaction fast path (every
            hit, rows ascending) without any k-wide top_k.

    Returns:
        idx   [B, k] int32 indices into the ORIGINAL cloud (0-padded),
        n_eff [B]    int32 true neighbor count (clipped at k).
    """
    rows, _, took_hit, n_eff = _query_select(
        grid, queries, radius, k=k, cell_capacity=cell_capacity, seed=seed,
        window_capacity=window_capacity,
    )
    idx = jnp.where(took_hit, grid.order[rows], 0)
    return idx.astype(jnp.int32), n_eff


def _ball_query_sorted(grid, queries, radius, *, k, cell_capacity, seed=None,
                       window_capacity=None):
    """ball_query, but returning positions in the grid's SORTED point
    array ([B, k] rows + hit mask + n_eff) — callers that gather from
    `grid.points` directly skip the inverse-permutation round trip of
    original-index output."""
    rows, _, took_hit, n_eff = _query_select(
        grid, queries, radius, k=k, cell_capacity=cell_capacity, seed=seed,
        window_capacity=window_capacity,
    )
    return rows, took_hit, n_eff


def _candidate_window(grid, queries, radius, *, cell_capacity,
                      window_capacity):
    """The 27-cell candidate window of each query.

    Returns:
        cand   [B, T] int32 rows into the SORTED cloud (0 where invalid),
        cpts   [B, T, 3] the candidates' raw coordinates,
        hit    [B, T] bool true-distance ball membership,
        n_hits [B] int32 exact ball population (uncapped).
    """
    B = queries.shape[0]
    radius = jnp.asarray(radius, jnp.float32)
    queries = queries.astype(jnp.float32)

    dims = grid.dims
    ijk = jnp.floor((queries - grid.origin) / grid.cell_size).astype(jnp.int32)

    # 27 neighboring cells per query -> [B, 27]
    offs = jnp.stack(
        jnp.meshgrid(*([jnp.arange(-1, 2)] * 3), indexing="ij"), axis=-1
    ).reshape(27, 3)
    ncell = ijk[:, None, :] + offs[None]  # [B, 27, 3]
    in_bounds = jnp.all((ncell >= 0) & (ncell < dims[None, None]), axis=-1)
    ncell = jnp.clip(ncell, 0, dims - 1)
    nids = (ncell[..., 0] * dims[1] + ncell[..., 1]) * dims[2] + ncell[..., 2]
    # A cell visited twice (clipping collisions on small grids) counts
    # only at its first occurrence — otherwise neighbors would be
    # double-counted.  Out-of-bounds slots compare under unique negative
    # sentinels so a clipped id never shadows a real visit.
    sentinel = -1 - jnp.arange(27, dtype=jnp.int32)
    nids_cmp = jnp.where(in_bounds, nids, sentinel[None])
    eq_earlier = (nids_cmp[:, :, None] == nids_cmp[:, None, :]) & jnp.tril(
        jnp.ones((27, 27), bool), k=-1
    )[None]
    first_visit = ~jnp.any(eq_earlier, axis=-1)

    # Per-cell ranges from the grid's dense CSR row table: two gathers,
    # vs. 2 x 27 x B binary searches over the sorted ids per call.
    tbl = grid.cell_starts
    nc = jnp.clip(nids, 0, tbl.shape[0] - 2)
    starts = tbl[nc]
    counts = (tbl[nc + 1] - starts) * (in_bounds & first_visit)

    if window_capacity is not None:
        # CSR compaction: lane j of query b maps to the j-th point of
        # b's 27-cell window (segments concatenated in cell order), so
        # the lane budget tracks the REAL window population instead of
        # 27 x the worst single cell.  Gather width, distance tests,
        # draw keys and the top_k all shrink by the same factor.
        #
        # Lane -> segment resolution is a SCATTER + forward cummax, not
        # per-lane arithmetic: the rounds-3/4 formulation (seg = #(cum
        # <= lane) over a [B, T, 27] compare-reduce, then
        # take_along_axis(starts/cum, seg)) spent 20.6 ms of a 27.3 ms
        # r=0.05 extraction at B=1024 — 19.9 ms of it in the two
        # [B, T]-from-[B, 27] take_along_axis gathers alone (measured,
        # docs/PERF.md round 5).  Here each live segment scatters its
        # (start row, start position) at its window position and a
        # cummax forward-fills lanes — 2.9 ms for identical output.
        #
        # Why cummax is correct: lanes enumerate the 27 cells in
        # ascending cell id (the offset meshgrid is lexicographic and
        # the id strides are positive), and the CSR row table ascends
        # with cell id, so both scattered values are non-decreasing
        # along positions over LIVE segments.  Empty/masked segments
        # scatter NEG (never win the max); a segment starting at or
        # beyond the lane budget is dropped (mode="drop"), preserving
        # the documented truncation semantics for under-sized caps.
        T = int(window_capacity)
        cum = jnp.cumsum(counts, axis=1)  # [B, 27]
        total = cum[:, -1:]
        p = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), cum[:, :-1]], axis=1
        )  # segment start positions
        live = counts > 0
        NEG = jnp.int32(-(2**31) + 1)
        rowix = jnp.arange(B)[:, None]
        startf = (
            jnp.full((B, T), NEG, jnp.int32)
            .at[rowix, p]
            .max(jnp.where(live, starts, NEG), mode="drop")
        )
        pf = (
            jnp.full((B, T), NEG, jnp.int32)
            .at[rowix, p]
            .max(jnp.where(live, p, NEG), mode="drop")
        )
        startf = jax.lax.cummax(startf, axis=1)
        pf = jax.lax.cummax(pf, axis=1)
        lane = jnp.arange(T, dtype=jnp.int32)
        # NEG cancels exactly (two's complement) when no segment owns a
        # lane; those lanes are invalid-masked anyway.
        cand = startf + (lane[None] - pf)
        valid = lane[None] < total
        cand = jnp.where(valid, cand, 0)
    else:
        # candidate rows: [B, 27, C] indices into the sorted cloud
        lane = jnp.arange(cell_capacity, dtype=jnp.int32)
        cand = starts[..., None] + lane[None, None]
        valid = lane[None, None] < jnp.minimum(counts, cell_capacity)[..., None]
        cand = jnp.where(valid, cand, 0).reshape(B, 27 * cell_capacity)
        valid = valid.reshape(B, 27 * cell_capacity)

    cpts = grid.points[cand]  # [B, T, 3]
    d2 = jnp.sum(jnp.square(cpts - queries[:, None]), axis=-1)
    hit = valid & (d2 <= radius * radius)
    n_hits = jnp.sum(hit, axis=1).astype(jnp.int32)
    return cand, cpts, hit, n_hits


def _query_select(grid, queries, radius, *, k, cell_capacity, seed=None,
                  window_capacity=None):
    """Candidate window + k-subset selection.

    Returns (rows [B, k] into the SORTED cloud, pts [B, k, 3] the
    selected points' raw coordinates, took_hit [B, k] prefix mask,
    n_eff [B]).  Both rows and pts are zeroed outside the prefix.  The
    points ride along from the window gather (`take_along_axis` over
    the lane axis) so callers never re-gather from the cloud.
    """
    cand, cpts, hit, n_hits = _candidate_window(
        grid, queries, radius, cell_capacity=cell_capacity,
        window_capacity=window_capacity,
    )
    B, T = hit.shape
    n_eff = jnp.minimum(n_hits, k).astype(jnp.int32)

    if T <= k:
        # The whole candidate window fits in the k output lanes, so no
        # draw (first-k or seeded-uniform) can drop a hit: selection
        # degenerates to compaction.  Lanes enumerate cells by ascending
        # id and rows ascend within a cell, so compacting in lane order
        # yields every hit with rows ascending — bit-identical to both
        # the first-k and the seeded-draw output for these windows, at
        # the cost of one [B, T] sort instead of a k-wide top_k.
        lane = jnp.arange(T, dtype=jnp.int32)
        ordv = jnp.where(hit, lane[None], lane[None] + T)
        lane_sel = jnp.sort(ordv, axis=1)
        lane_sel = jnp.where(lane_sel < T, lane_sel, lane_sel - T)
        rows = jnp.take_along_axis(cand, lane_sel, axis=1)
        pts = jnp.take_along_axis(cpts, lane_sel[:, :, None], axis=1)
        if T < k:
            rows = jnp.pad(rows, ((0, 0), (0, k - T)))
            pts = jnp.pad(pts, ((0, 0), (0, k - T), (0, 0)))
        took_hit = jnp.arange(k, dtype=jnp.int32)[None] < n_eff[:, None]
    else:
        # Compact k hits via top_k over a positive key (misses get key 0
        # and are masked out — `vals > 0` <=> real hit).
        if seed is None:
            # Deterministic first-k in lane order: hits get distinct
            # descending keys, so top_k returns exactly the first k hits
            # in order.  NOTE: lanes enumerate the 27-cell window
            # spatially, so oversized balls get a corner-biased
            # subsample — pass a seed for the reference's uniform draw.
            lane_key = jnp.arange(T, 0, -1, dtype=jnp.int32)  # T..1
            key = jnp.where(hit, lane_key[None], 0)
        else:
            # Uniform k-subset per query: each (query, candidate) pair
            # gets an i.i.d.-uniform hash key, so the top-k hits are a
            # uniform without-replacement draw from the ball —
            # independent across queries (the host path's per-patch
            # rng.choice, `pcpnet_dataset.py:319-321`).  Key collisions
            # only tie-break order among equals, which a set-valued draw
            # doesn't care about.  Selected points come back in hash-key
            # order, NOT ascending-row order: downstream consumers are
            # point-permutation-invariant (MuPS reduces over the point
            # axis) and the points are lifted from the already-resident
            # window, so there is no scattered HBM gather to re-sort for.
            q_salt = _mix32(
                jnp.arange(B, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
                + jnp.asarray(seed, jnp.uint32)
            )
            h = _mix32(cand.astype(jnp.uint32) ^ q_salt[:, None])
            key = jnp.where(hit, (h >> jnp.uint32(2)).astype(jnp.int32) | 1, 0)
        vals, take = jax.lax.top_k(key, k)  # [B, k]
        took_hit = vals > 0
        rows = jnp.take_along_axis(cand, take, axis=1)
        pts = jnp.take_along_axis(cpts, take[:, :, None], axis=1)

    rows = jnp.where(took_hit, rows, 0)
    pts = jnp.where(took_hit[:, :, None], pts, 0.0)
    return rows, pts, took_hit, n_eff


def extract_patches(
    grid: HashGrid,
    queries: jnp.ndarray,
    radius,
    *,
    k: int,
    cell_capacity: int = 64,
    center: str = "point",
    seed=None,
    window_capacity: int | None = None,
):
    """Ball query + the reference's patch post-processing on device:
    gather neighbor coordinates, zero-pad, center at the query point (or
    patch mean), scale by 1/radius (`pcpnet_dataset.py:298-343`).
    `seed` (uint32 scalar) switches oversized-ball subsampling from
    lane-order first-k to a uniform per-query draw — see `ball_query`.
    `window_capacity` selects the CSR-compacted candidate layout (same
    results, fewer lanes — see `ball_query`).

    Returns (patch_points [B, k, 3], n_eff [B]).
    """
    _, pts, took_hit, n_eff = _query_select(
        grid, queries, radius, k=k, cell_capacity=cell_capacity, seed=seed,
        window_capacity=window_capacity,
    )
    # pts are the selected candidates' coordinates, lifted straight from
    # the window gather — no second HBM gather over the cloud.
    mask = took_hit[..., None]
    radius = jnp.asarray(radius, jnp.float32)
    if center == "point":
        pts = pts - queries[:, None]
    elif center == "mean":
        denom = jnp.maximum(n_eff[:, None, None], 1).astype(jnp.float32)
        mean = jnp.sum(jnp.where(mask, pts, 0.0), axis=1, keepdims=True) / denom
        pts = pts - mean
    pts = jnp.where(mask, pts / radius, 0.0)
    return pts, n_eff


def max_cell_occupancy(grid: HashGrid) -> int:
    """Host-side helper: the largest point count in any cell, for
    validating `cell_capacity` (a cap below this can drop candidates)."""
    ids = np.asarray(grid.cell_ids)
    if ids.size == 0:
        return 0
    _, counts = np.unique(ids, return_counts=True)
    return int(counts.max())


def _max_window_from_ids(ids: np.ndarray, dims: tuple) -> int:
    """Max 3x3x3-window population of a binned cloud: 3-tap sliding sum
    of the per-cell count grid along each axis (boundary windows
    zero-padded, matching the query's in-bounds masking), then max."""
    counts = np.bincount(ids, minlength=int(np.prod(dims))).reshape(dims)
    s = counts.astype(np.int64)
    for ax in range(3):
        p = np.pad(s, [(1, 1) if a == ax else (0, 0) for a in range(3)])
        s = (
            np.take(p, range(0, dims[ax]), axis=ax)
            + np.take(p, range(1, dims[ax] + 1), axis=ax)
            + np.take(p, range(2, dims[ax] + 2), axis=ax)
        )
    return int(s.max())


def max_window_occupancy(grid: HashGrid) -> int:
    """Host-side helper: the largest point count in any 3x3x3 cell
    window — the exact lane budget `window_capacity` needs so the CSR
    candidate layout never drops a window point."""
    ids = np.asarray(grid.cell_ids)
    if ids.size == 0:
        return 0
    dims = tuple(int(d) for d in np.asarray(grid.dims))
    return _max_window_from_ids(ids, dims)


def window_occupancy_np(points: np.ndarray, radius: float, *,
                        max_dim: int = 64) -> int:
    """`max_window_occupancy` without the device grid: a pure-numpy
    mirror of `build_grid`'s binning (same f32 arithmetic, so the cell
    assignment is bit-identical to the device's) followed by the
    sliding-window max.  Callers sizing `window_capacity` for a WHOLE
    dataset pre-pass every cloud through this — no uploads, no device
    fetches, no per-shape jit-key churn."""
    pts = np.asarray(points, np.float32)
    if pts.size == 0:
        return 0
    lo = pts.min(0)
    hi = pts.max(0)
    radius = np.float32(radius)
    dims = np.minimum(
        np.maximum(np.ceil((hi - lo) / radius), 1).astype(np.int32), max_dim
    )
    cell = np.float32(
        np.max(np.maximum((hi - lo) / dims.astype(np.float32), radius))
    )
    dims = np.maximum(np.ceil((hi - lo) / cell).astype(np.int32), 1)
    ijk = np.clip(
        np.floor((pts - lo) / cell).astype(np.int32), 0, dims - 1
    )
    ids = (ijk[:, 0] * dims[1] + ijk[:, 1]) * dims[2] + ijk[:, 2]
    return _max_window_from_ids(ids, tuple(int(d) for d in dims))
