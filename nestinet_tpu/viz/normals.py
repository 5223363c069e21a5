"""Normal-field visualization utilities.

Capability parity with the visualization pieces the evaluation harness
uses (`utils/visualization.py:699-838`, `utils/utils.py:332-353`,
`MATLAB/Sphere2RGBCube.m`): normals-as-RGB coloring, spherical-domain
(phi, theta) scatter plots with optional expert coloring, and discrete
colormaps.  matplotlib imports are deferred so the core framework stays
import-light on workers.
"""

from __future__ import annotations

import numpy as np


def euclidean_to_spherical(points: np.ndarray, degrees: bool = True):
    """xyz -> (phi, theta) on the unit sphere (ISO convention; parity:
    `utils/utils.py:332-353`)."""
    points = np.asarray(points)
    theta = np.arctan2(
        np.sqrt(points[:, 0] ** 2 + points[:, 1] ** 2), points[:, 2]
    )
    phi = np.arctan2(points[:, 1], points[:, 0])
    if degrees:
        phi, theta = np.rad2deg(phi), np.rad2deg(theta)
    return phi, theta


def normal2rgb(normals: np.ndarray) -> np.ndarray:
    """Map unit normals to RGB in [0, 1] (x,y,z -> r,g,b), the standard
    normal-map coloring (parity: `visualization.py:699-713`)."""
    normals = np.asarray(normals, dtype=np.float64)
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    norm = np.where(norm == 0, 1.0, norm)
    return 0.5 * (normals / norm) + 0.5


def discrete_cmap(n: int, base_cmap: str = "nipy_spectral"):
    """An N-color discrete colormap (parity: `visualization.py` helper)."""
    import matplotlib.pyplot as plt
    from matplotlib.colors import ListedColormap

    base = plt.get_cmap(base_cmap)
    colors = base(np.linspace(0, 1, n))
    return ListedColormap(colors, name=f"{base_cmap}_{n}")


def draw_phi_theta_domain(
    phi,
    theta,
    color="k",
    *,
    ax=None,
    title=None,
    cmap=None,
    n_labels=None,
    footnote=None,
    filename=None,
    fmt="png",
    display=False,
):
    """Scatter normals in the (phi, theta) domain; `color` may be an
    array (e.g. expert ids) with a discrete cmap (parity:
    `visualization.py:746-797`)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(8, 5))
    sc = ax.scatter(phi, theta, s=2, c=color, cmap=cmap)
    ax.set_xlabel(r"$\phi$ [deg]")
    ax.set_ylabel(r"$\theta$ [deg]")
    ax.set_xlim(-180, 180)
    ax.set_ylim(0, 180)
    if title:
        ax.set_title(title)
    if cmap is not None and n_labels is not None:
        cb = plt.colorbar(sc, ax=ax, ticks=range(n_labels))
        cb.set_label("expert")
    if footnote:
        ax.annotate(
            footnote, xy=(0, -0.12), xycoords="axes fraction", fontsize=7
        )
    if filename:
        ax.figure.savefig(f"{filename}.{fmt}", dpi=150, bbox_inches="tight")
    if display:  # pragma: no cover
        plt.show()
    return ax


def draw_line_segments(phi0, theta0, phi1, theta1, *, ax=None, filename=None,
                       fmt="png", footnote=None, display=False):
    """GT -> prediction line segments in the (phi, theta) domain
    (parity: `visualization.py:798-841`)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(8, 5))
    for a, b, c, d in zip(phi0, theta0, phi1, theta1):
        ax.plot([a, c], [b, d], color="0.7", linewidth=0.5, zorder=0)
    if footnote:
        ax.annotate(footnote, xy=(0, -0.12), xycoords="axes fraction", fontsize=7)
    if filename:
        ax.figure.savefig(f"{filename}.{fmt}", dpi=150, bbox_inches="tight")
    if display:  # pragma: no cover
        plt.show()
    return ax


def visualize_pc_normals(points, normals, *, filename=None, fmt="png"):
    """3D scatter of a cloud colored by normal2rgb
    (parity: `visualization.py:715-745`)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(
        points[:, 0], points[:, 1], points[:, 2], s=1, c=normal2rgb(normals)
    )
    ax.set_axis_off()
    if filename:
        fig.savefig(f"{filename}.{fmt}", dpi=150, bbox_inches="tight")
    return ax
