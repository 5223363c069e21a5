"""Real-scan streaming inference: depth image -> world xyz -> per-point
normals -> optional normal-map image.

The reference handled real scans (ScanNet / NYU-v2) with offline MATLAB
pre/post-processing around `test_n_est_w_experts.py`
(`MATLAB/ScanNet_depth2xyz.m`, `MATLAB/ScanNet_world2cam_normals.m`,
`utils/nyu_test_all.py`); here the whole chain is one call / one CLI.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from ..core import textio
from ..data.depth import depth_to_xyz, world_to_image
from .predict import predict_shapes


def load_depth(path: str, depth_shift: float = 1000.0) -> np.ndarray:
    """Load a depth image: .npy/.npz (raw values), 16-bit .png
    (millimeters / depth_shift), or whitespace .txt."""
    ext = os.path.splitext(path)[1].lower()
    if ext in (".npy",):
        return np.load(path)
    if ext in (".npz",):
        z = np.load(path)
        return z[list(z.files)[0]]
    if ext in (".png", ".pgm"):
        from PIL import Image

        return np.asarray(Image.open(path), dtype=np.float64)
    return np.loadtxt(path)


def predict_scan(
    run_dir: str,
    depth_img: np.ndarray,
    intrinsic: np.ndarray,
    pose: np.ndarray | None = None,
    *,
    depth_shift: float = 1.0,
    batch_size: int = 128,
    loader_workers: int = 8,
    output_dir: str | None = None,
    scan_name: str = "scan",
    moe_inference: str = "sparse",
    project_to_image: bool = False,
) -> dict:
    """Depth map -> world points -> normals (+ optional image render).

    Returns the predict_shapes stats dict extended with:
        points:        [M, 3] the unprojected world points
        normals_path:  the written .normals file
        normal_image:  [H, W, 3] when project_to_image (also saved .npy)
    """
    if pose is None:
        pose = np.eye(4)
    points = depth_to_xyz(depth_img, intrinsic, pose, depth_shift=depth_shift)
    if points.shape[0] == 0:
        raise ValueError("depth image produced no valid points")

    with tempfile.TemporaryDirectory() as tmp:
        # C-speed savetxt (core/textio.py): a 100k-point scan's .xyz
        # costs ~0.8 s via np.savetxt on this 1-core host, ~80 ms native
        textio.savetxt(
            os.path.join(tmp, scan_name + ".xyz"),
            points.astype(np.float64),
        )
        with open(os.path.join(tmp, "scanset.txt"), "w") as f:
            f.write(scan_name + "\n")
        stats = predict_shapes(
            run_dir,
            dataset_name=scan_name,
            testset="scanset.txt",
            data_path=tmp,
            batch_size=batch_size,
            loader_workers=loader_workers,
            output_dir=output_dir,
            moe_inference=moe_inference,
        )

    normals_path = os.path.join(stats["output_dir"], scan_name + ".normals")
    stats["points"] = points
    stats["normals_path"] = normals_path
    if project_to_image:
        normals = np.loadtxt(normals_path)
        norm = np.linalg.norm(normals, axis=1, keepdims=True)
        normals = normals / np.where(norm == 0, 1.0, norm)
        img = world_to_image(
            points, normals, depth_img.shape, intrinsic, pose
        )
        img_path = os.path.join(stats["output_dir"], scan_name + "_normals_img.npy")
        np.save(img_path, img)
        stats["normal_image"] = img
        stats["normal_image_path"] = img_path
    return stats
