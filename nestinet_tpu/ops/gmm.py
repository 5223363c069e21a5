"""Grid Gaussian-mixture construction for 3DmFV statistics.

Capability parity with the reference's GMM utilities
(`/root/reference/utils/utils.py:10-122`): a uniform grid of isotropic
Gaussians over [-1, 1]^D with uniform weights, plus an optional
data-learned GMM.  Re-designed as a plain immutable dataclass of numpy
arrays (JSON/npz-serializable) instead of a pickled sklearn object —
py2 pickles are a portability bug we do not replicate.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np


@dataclasses.dataclass(frozen=True)
class GridGMM:
    """An isotropic diagonal-covariance Gaussian mixture.

    Attributes:
        weights:     [K]    mixture weights (sum to 1).
        means:       [K, D] component means.
        covariances: [K, D] per-axis variances (sigma^2).
    """

    weights: np.ndarray
    means: np.ndarray
    covariances: np.ndarray

    # ---- derived ----
    @property
    def sigma(self) -> np.ndarray:
        """Per-axis standard deviations [K, D] (what the kernels consume)."""
        return np.sqrt(self.covariances)

    @property
    def n_gaussians(self) -> int:
        return int(self.means.shape[0])

    @property
    def dim(self) -> int:
        return int(self.means.shape[1])

    @property
    def resolution(self) -> int:
        """Cube-root grid resolution (for D=3 grid GMMs)."""
        return int(round(self.n_gaussians ** (1.0 / self.dim)))

    def astuple(self):
        return (
            self.weights.astype(np.float32),
            self.means.astype(np.float32),
            self.sigma.astype(np.float32),
        )

    # ---- serialization (run-dir contract: gmm.json replaces gmm.p) ----
    def save(self, path: str) -> None:
        payload = {
            "weights": self.weights.tolist(),
            "means": self.means.tolist(),
            "covariances": self.covariances.tolist(),
        }
        with open(path, "w") as f:
            json.dump(payload, f)

    @staticmethod
    def load(path: str) -> "GridGMM":
        with open(path) as f:
            payload = json.load(f)
        return GridGMM(
            weights=np.asarray(payload["weights"], dtype=np.float64),
            means=np.asarray(payload["means"], dtype=np.float64),
            covariances=np.asarray(payload["covariances"], dtype=np.float64),
        )


def _grid_means(subdivisions, lo=-1.0, hi=1.0) -> np.ndarray:
    """Component centers on a uniform grid.

    Matches the reference's layout (`utils.py:81-86`): along each axis the
    centers are `linspace(step-1, 1-step, m)` with `step = 1/m`, and the
    flattened component order is C-order with the LAST axis fastest.
    """
    axes = []
    for m in subdivisions:
        step = (hi - lo) / (2.0 * m)
        axes.append(np.linspace(lo + step, hi - step, m))
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.reshape(-1) for g in mesh], axis=-1)


def get_3d_grid_gmm(subdivisions=(5, 5, 5), variance=0.04) -> GridGMM:
    """K = m^3 isotropic Gaussians on a uniform grid over [-1, 1]^3.

    Parity target: `utils.py:70-95`.  Uniform weights 1/K, diagonal
    covariance = `variance` on every axis (recommended variance is
    (1/m)^2 per the reference trainer flags).
    """
    subdivisions = list(subdivisions)
    assert len(subdivisions) == 3
    means = _grid_means(subdivisions)
    k = means.shape[0]
    return GridGMM(
        weights=np.full((k,), 1.0 / k, dtype=np.float64),
        means=means.astype(np.float64),
        covariances=np.full_like(means, variance, dtype=np.float64),
    )


def get_2d_grid_gmm(subdivisions=(5, 5), variance=0.04) -> GridGMM:
    """2D analog (parity: `utils.py:98-122`)."""
    subdivisions = list(subdivisions)
    assert len(subdivisions) == 2
    means = _grid_means(subdivisions)
    k = means.shape[0]
    return GridGMM(
        weights=np.full((k,), 1.0 / k, dtype=np.float64),
        means=means.astype(np.float64),
        covariances=np.full_like(means, variance, dtype=np.float64),
    )


def get_gmm(
    points: np.ndarray | None,
    n_gaussians,
    *,
    type: str = "grid",
    variance: float = 0.04,
    dim: int = 3,
    cache_dir: str | None = None,
) -> GridGMM:
    """Dispatch between the grid-constructed and data-learned GMMs.

    Parity: `utils/utils.py:20-51` (`get_gmm(points, n_gaussians,
    NUM_POINT, type='grid'|'learn', ...)`); the learned path caches by
    data size like the reference's gmms/gmm_*.p pickle cache."""
    if type == "grid":
        subdiv = (
            list(n_gaussians)
            if isinstance(n_gaussians, (list, tuple))
            else [int(n_gaussians)] * dim
        )
        if dim == 2:
            return get_2d_grid_gmm(subdiv[:2], variance=variance)
        if dim == 3:
            return get_3d_grid_gmm(subdiv[:3], variance=variance)
        raise ValueError("grid GMMs support dim 2 or 3")
    if type == "learn":
        if isinstance(n_gaussians, (list, tuple)):
            raise ValueError("learned GMM needs a scalar n_gaussians")
        if points is None:
            raise ValueError("learned GMM needs data points")
        return get_learned_gmm(points, int(n_gaussians), cache_dir=cache_dir)
    raise ValueError(f"unknown GMM type: {type!r} (grid|learn)")


def get_learned_gmm(points: np.ndarray, n_gaussians: int, cache_dir: str | None = None) -> GridGMM:
    """Fit a diagonal GMM to data with sklearn (host-side, offline).

    Parity: `utils.py:34-47, 54-67` including the fit-once-then-cache
    behavior, but cached as portable JSON instead of a pickle.
    """
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        cache = os.path.join(
            cache_dir, f"gmm_g{n_gaussians}_N{points.shape[0]}.json"
        )
        if os.path.isfile(cache):
            return GridGMM.load(cache)
    from sklearn.mixture import GaussianMixture

    skgmm = GaussianMixture(n_components=n_gaussians, covariance_type="diag")
    skgmm.fit(points.astype(np.float64))
    gmm = GridGMM(
        weights=skgmm.weights_,
        means=skgmm.means_,
        covariances=skgmm.covariances_,
    )
    if cache_dir is not None:
        gmm.save(cache)
    return gmm
