"""Synthetic PCPNet-format fixtures with analytic ground-truth normals."""

import os

import numpy as np


def make_plane(n_points, rng, noise=0.0):
    """Unit plane z=0; normals (0,0,1)."""
    pts = np.zeros((n_points, 3))
    pts[:, :2] = rng.uniform(-1, 1, size=(n_points, 2))
    if noise > 0:
        pts[:, 2] += noise * rng.randn(n_points)
    normals = np.tile([0.0, 0.0, 1.0], (n_points, 1))
    return pts, normals


def make_sphere(n_points, rng, radius=1.0, noise=0.0):
    """Unit sphere; normals = outward radial directions."""
    v = rng.randn(n_points, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = radius * v
    if noise > 0:
        pts += noise * rng.randn(n_points, 3)
    return pts, v


def write_pcpnet_dataset(
    root,
    shapes,
    list_name="trainingset.txt",
    n_pidx=50,
    noise_levels=None,
    curvatures=False,
    seed=0,
):
    """Write {name: (points, normals)} as a PCPNet-format dataset.

    Creates .xyz/.normals/.pidx text files plus the shape-list file;
    returns the list filename.
    """
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    names = list(shapes)
    for name in names:
        pts, normals = shapes[name]
        np.savetxt(os.path.join(root, name + ".xyz"), pts)
        np.savetxt(os.path.join(root, name + ".normals"), normals)
        pidx = rng.choice(pts.shape[0], size=min(n_pidx, pts.shape[0]), replace=False)
        np.savetxt(os.path.join(root, name + ".pidx"), pidx, fmt="%i")
        if curvatures:
            np.savetxt(
                os.path.join(root, name + ".curv"),
                rng.randn(pts.shape[0], 2),
            )
    with open(os.path.join(root, list_name), "w") as f:
        f.write("\n".join(names) + "\n")
    if noise_levels is not None:
        with open(
            os.path.join(root, list_name[:-4] + "_noise_levels.txt"), "w"
        ) as f:
            f.write("\n".join(str(x) for x in noise_levels) + "\n")
    return list_name
