"""Native C++ patch sampler vs the scipy/numpy reference path."""

import numpy as np
import pytest
from scipy import spatial

from nestinet_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native sampler not built (no g++?)"
)


@pytest.fixture
def cloud(rng):
    return rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)


def test_ball_counts_match_scipy(cloud, rng):
    sampler = native.NativePatchSampler(cloud)
    tree = spatial.cKDTree(cloud)
    for _ in range(50):
        i = rng.randint(cloud.shape[0])
        r = float(rng.uniform(0.05, 0.6))
        got = sampler.count_ball(cloud[i], r)
        want = len(tree.query_ball_point(cloud[i], r))
        assert got == want


def test_sample_patches_semantics(cloud, rng):
    sampler = native.NativePatchSampler(cloud)
    tree = spatial.cKDTree(cloud)
    radii = [0.1, 0.3]
    N = 64
    centers = rng.choice(cloud.shape[0], size=16, replace=False).astype(np.int64)
    pts, neff = sampler.sample_patches(centers, radii, N, seed=7, center="point")
    assert pts.shape == (16, 2 * N, 3)
    assert neff.shape == (16, 2)

    for b, ci in enumerate(centers):
        for s, rad in enumerate(radii):
            inds = tree.query_ball_point(cloud[ci], rad)
            expect_count = min(N, len(inds))
            assert neff[b, s] == expect_count

            block = pts[b, s * N : s * N + neff[b, s]]
            # all selected points lie within the (scaled) unit ball
            assert np.all(np.linalg.norm(block, axis=1) <= 1.0 + 1e-4)
            # selected points are genuine neighbors: undo center+scale
            restored = block * rad + cloud[ci]
            d, _ = tree.query(restored)
            assert np.all(d < 1e-4)
            # padding is zero
            assert np.all(pts[b, s * N + neff[b, s] : (s + 1) * N] == 0)


def test_sample_patches_deterministic(cloud):
    sampler = native.NativePatchSampler(cloud)
    centers = np.arange(8, dtype=np.int64)
    a1, n1 = sampler.sample_patches(centers, [0.4], 32, seed=5)
    a2, n2 = sampler.sample_patches(centers, [0.4], 32, seed=5)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(n1, n2)
    b1, _ = sampler.sample_patches(centers, [0.4], 32, seed=6)
    assert not np.array_equal(a1, b1)


def test_center_modes(cloud):
    sampler = native.NativePatchSampler(cloud)
    centers = np.array([10], dtype=np.int64)
    # 'point': center point maps to origin
    pts, neff = sampler.sample_patches(centers, [0.5], 512, center="point")
    block = pts[0, : neff[0, 0]]
    assert np.any(np.all(np.abs(block) < 1e-6, axis=1))
    # 'mean': selected points have zero mean
    pts, neff = sampler.sample_patches(centers, [0.5], 512, center="mean")
    block = pts[0, : neff[0, 0]]
    np.testing.assert_allclose(block.mean(0), 0.0, atol=1e-5)
    # 'none': points are raw/scaled only
    pts, neff = sampler.sample_patches(centers, [0.5], 512, center="none")
    block = pts[0, : neff[0, 0]]
    restored = block * 0.5
    tree = spatial.cKDTree(cloud)
    d, _ = tree.query(restored)
    assert np.all(d < 1e-4)
