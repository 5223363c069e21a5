"""On-device grid-hash ball query vs the scipy cKDTree ground truth."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

import jax.numpy as jnp

from nestinet_tpu.ops.ball_query import (
    ball_query,
    build_grid,
    extract_patches,
    max_cell_occupancy,
)


def _case(rng, m=2000, b=64, radius=0.15):
    pts = rng.uniform(-1, 1, size=(m, 3)).astype(np.float32)
    q = pts[rng.choice(m, b, replace=False)]
    return pts, q, radius


def test_matches_scipy_sets(rng):
    pts, q, radius = _case(rng)
    tree = cKDTree(pts)
    want = tree.query_ball_point(q, radius)

    grid = build_grid(jnp.asarray(pts), radius)
    assert max_cell_occupancy(grid) <= 64
    idx, n_eff = ball_query(grid, jnp.asarray(q), radius, k=256)
    idx, n_eff = np.asarray(idx), np.asarray(n_eff)

    for i in range(q.shape[0]):
        got = set(idx[i, : n_eff[i]].tolist())
        assert len(got) == n_eff[i], "duplicate neighbor returned"
        assert got == set(want[i]), f"query {i} neighbor set mismatch"


def test_neff_clips_at_k(rng):
    pts, q, radius = _case(rng, radius=0.5)
    tree = cKDTree(pts)
    true_counts = np.array([len(s) for s in tree.query_ball_point(q, radius)])
    grid = build_grid(jnp.asarray(pts), radius, max_dim=16)
    idx, n_eff = ball_query(grid, jnp.asarray(q), radius, k=32,
                            cell_capacity=512)
    n_eff = np.asarray(n_eff)
    np.testing.assert_array_equal(n_eff, np.minimum(true_counts, 32))
    # every returned neighbor really is inside the ball
    d = np.linalg.norm(pts[np.asarray(idx)] - q[:, None], axis=-1)
    row = np.arange(32)[None] < n_eff[:, None]
    assert np.all(d[row] <= radius + 1e-6)


def test_small_grid_dedupes_clipped_cells(rng):
    # A cloud much smaller than the radius -> a 1x1x1 grid where all 27
    # neighbor offsets clip onto the same cell.
    pts = rng.uniform(-0.01, 0.01, size=(50, 3)).astype(np.float32)
    grid = build_grid(jnp.asarray(pts), 1.0)
    idx, n_eff = ball_query(grid, jnp.asarray(pts[:4]), 1.0, k=64,
                            cell_capacity=64)
    n_eff = np.asarray(n_eff)
    np.testing.assert_array_equal(n_eff, 50)  # all points, counted once
    for i in range(4):
        got = np.asarray(idx)[i, :50]
        assert len(set(got.tolist())) == 50


def test_extract_patches_semantics(rng):
    pts, q, radius = _case(rng, m=500, b=8)
    grid = build_grid(jnp.asarray(pts), radius)
    patch, n_eff = extract_patches(
        grid, jnp.asarray(q), radius, k=64, center="point"
    )
    patch, n_eff = np.asarray(patch), np.asarray(n_eff)
    tree = cKDTree(pts)
    for i in range(8):
        nbrs = tree.query_ball_point(q[i], radius)
        assert n_eff[i] == min(len(nbrs), 64)
        # rows beyond n_eff are zero padding
        assert np.all(patch[i, n_eff[i]:] == 0.0)
        # valid rows: centered at query, scaled by 1/radius, inside unit ball
        norms = np.linalg.norm(patch[i, : n_eff[i]], axis=1)
        assert norms.max() <= 1.0 + 1e-5
        # reconstruct the original coordinates and check set membership
        rec = patch[i, : n_eff[i]] * radius + q[i]
        want = pts[nbrs]
        d = np.linalg.norm(rec[:, None] - want[None], axis=-1)
        assert d.min(axis=1).max() < 1e-5


def test_capacity_cap_detectable(rng):
    pts = np.zeros((100, 3), np.float32)  # everything in one cell
    grid = build_grid(jnp.asarray(pts), 0.5)
    assert max_cell_occupancy(grid) == 100
    # a too-small cap silently truncates candidates — callers check
    # max_cell_occupancy first; verify the truncation bound holds
    idx, n_eff = ball_query(grid, jnp.asarray(pts[:2]), 0.5, k=128,
                            cell_capacity=32)
    assert np.all(np.asarray(n_eff) == 32)
