import jax.numpy as jnp
import numpy as np
import pytest

from nestinet_tpu.data.ply import read_ply, read_ply_points, write_ply
from nestinet_tpu.data.pointcloud import (
    point_cloud_three_views,
    point_cloud_to_volume,
    point_cloud_to_volume_batch,
    volume_to_point_cloud,
)
from nestinet_tpu.ops.gmm import get_3d_grid_gmm
from nestinet_tpu.ops.mups import fisher_vector_np, fv, tdmfv_seg, tdmfv_sym


@pytest.fixture
def gmm():
    return get_3d_grid_gmm([3, 3, 3], variance=0.111)


def test_tdmfv_sym_shapes_and_types(rng, gmm):
    w, mu, sigma = gmm.astuple()
    pts = jnp.asarray(rng.uniform(-1, 1, size=(2, 32, 3)), jnp.float32)
    for sym in ("max", "min", "ss"):
        out = tdmfv_sym(pts, w, mu, sigma, sym_type=sym)
        assert out.shape == (2, 7 * 27)
        assert np.all(np.isfinite(np.asarray(out)))
    grid = tdmfv_sym(pts, w, mu, sigma, sym_type="max", flatten=False)
    assert grid.shape == (2, 7, 27)


def test_fv_matches_numpy_oracle(rng, gmm):
    """The sum-aggregated TF FV and the numpy fisher_vector differ only
    in aggregation details; here we check the jnp `fv` against a direct
    per-point computation."""
    w, mu, sigma = gmm.astuple()
    pts = rng.uniform(-1, 1, size=(1, 64, 3))
    out = np.asarray(fv(jnp.asarray(pts, jnp.float32), w, mu, sigma, normalize=False))
    assert out.shape == (1, 7 * 27)
    assert np.all(np.isfinite(out))

    # Unnormalized d_pi channel equals sum of per-point (Q - w)/sqrt(w)/N.
    diff = pts[0][:, None, :] - mu[None]
    logp = -0.5 * np.sum((diff / sigma[None]) ** 2, -1)
    p = np.exp(logp) / ((2 * np.pi) ** 1.5 * np.prod(sigma, -1)[None])
    q = p * w
    q = q / q.sum(-1, keepdims=True)
    d_pi = ((q - w) / np.sqrt(w)).sum(0) / 64.0
    np.testing.assert_allclose(out[0, :27], d_pi, atol=1e-5)


def test_tdmfv_seg_outputs(rng, gmm):
    w, mu, sigma = gmm.astuple()
    pts = jnp.asarray(rng.uniform(-1, 1, size=(2, 16, 3)), jnp.float32)
    out, per_point = tdmfv_seg(pts, w, mu, sigma)
    assert out.shape == (2, 20 * 27)
    assert per_point.shape == (2, 16, 7 * 27)
    assert np.all(np.isfinite(np.asarray(per_point)))


def test_fisher_vector_np(rng, gmm):
    xx = rng.uniform(-1, 1, size=(50, 3))
    out = fisher_vector_np(xx, gmm)
    assert out.shape == (27 + 2 * 27 * 3,)
    assert np.all(np.isfinite(out))


# ---- PLY io ----

def test_ply_roundtrip_binary(tmp_path, rng):
    pts = rng.randn(100, 3).astype(np.float32)
    normals = rng.randn(100, 3).astype(np.float32)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, pts, normals=normals, binary=True)
    data = read_ply(path)
    vert = data["vertex"]
    np.testing.assert_allclose(
        np.stack([vert["x"], vert["y"], vert["z"]], -1), pts, atol=1e-6
    )
    np.testing.assert_allclose(
        np.stack([vert["nx"], vert["ny"], vert["nz"]], -1), normals, atol=1e-6
    )
    np.testing.assert_allclose(read_ply_points(path), pts, atol=1e-6)


def test_ply_roundtrip_ascii_with_faces(tmp_path, rng):
    pts = rng.randn(10, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    path = str(tmp_path / "mesh.ply")
    write_ply(path, pts, faces=faces, binary=False)
    data = read_ply(path)
    np.testing.assert_allclose(read_ply_points(path), pts, rtol=1e-5)
    np.testing.assert_array_equal(data["face"], faces)


def test_ply_binary_faces(tmp_path, rng):
    pts = rng.randn(6, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4]])
    path = str(tmp_path / "mesh_bin.ply")
    write_ply(path, pts, faces=faces, binary=True)
    data = read_ply(path)
    np.testing.assert_array_equal(data["face"], faces)


# ---- pc_util parity ----

def test_volume_roundtrip(rng):
    pts = rng.uniform(-0.9, 0.9, size=(64, 3)).astype(np.float32)
    vol = point_cloud_to_volume(pts, 16)
    assert vol.shape == (16, 16, 16)
    assert vol.sum() > 0
    back = volume_to_point_cloud(vol)
    assert back.shape[0] == int(vol.sum())

    batch = point_cloud_to_volume_batch(np.stack([pts, pts]), 8, flatten=True)
    assert batch.shape == (2, 512)

    views = point_cloud_three_views(pts, img_size=32)
    assert views.shape == (32, 96)
    assert views.max() <= 1.0


def test_ply_mixed_scalar_and_list_element(tmp_path, rng):
    """Elements mixing scalar and list properties (plyfile.py:364-916
    supports these; pre-round-5 the reader assumed all-or-nothing)."""
    from nestinet_tpu.data.ply import write_ply_elements

    faces = np.asarray([[0, 1, 2], [2, 3, 0], [1, 2, 3]], np.int32)
    quality = np.asarray([0.5, 0.25, 0.125], np.float32)
    flags = np.asarray([1, 0, 7], np.uint8)
    for binary in (True, False):
        path = str(tmp_path / f"mixed_{binary}.ply")
        write_ply_elements(
            path,
            {"face": {"quality": quality, "vertex_indices": faces,
                      "flags": flags}},
            binary=binary,
        )
        data = read_ply(path)["face"]
        assert isinstance(data, dict)
        np.testing.assert_allclose(data["quality"], quality, atol=1e-6)
        np.testing.assert_array_equal(data["vertex_indices"], faces)
        np.testing.assert_array_equal(data["flags"], flags)


def test_ply_multiple_list_properties_and_ragged(tmp_path):
    from nestinet_tpu.data.ply import write_ply_elements

    ragged = [[0, 1, 2, 3], [4, 5], [6, 7, 8]]
    tris = np.asarray([[0, 1, 2], [1, 2, 3], [2, 3, 4]], np.int32)
    for binary in (True, False):
        path = str(tmp_path / f"multi_{binary}.ply")
        write_ply_elements(
            path, {"cells": {"poly": ragged, "tri": tris}}, binary=binary
        )
        data = read_ply(path)["cells"]
        assert [list(r) for r in data["poly"]] == ragged
        np.testing.assert_array_equal(data["tri"], tris)


def test_ply_arbitrary_extra_element(tmp_path, rng):
    """Arbitrary non-vertex/face elements round-trip (general PLY)."""
    from nestinet_tpu.data.ply import write_ply_elements

    pts = rng.randn(5, 3).astype(np.float32)
    write_ply_elements(
        str(tmp_path / "extra.ply"),
        {
            "vertex": {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]},
            "camera": {"fx": np.asarray([500.0], np.float32),
                       "cx": np.asarray([320.0], np.float32)},
        },
        binary=True,
    )
    data = read_ply(str(tmp_path / "extra.ply"))
    np.testing.assert_allclose(read_ply_points(str(tmp_path / "extra.ply")),
                               pts, atol=1e-6)
    assert float(data["camera"]["fx"][0]) == 500.0
    assert float(data["camera"]["cx"][0]) == 320.0


def test_ply_big_endian_mixed(tmp_path):
    """Hand-built big-endian file with a mixed element parses."""
    header = (
        b"ply\nformat binary_big_endian 1.0\n"
        b"comment hand built\nobj_info test\n"
        b"element face 2\n"
        b"property float quality\n"
        b"property list uchar int vertex_indices\n"
        b"end_header\n"
    )
    body = b""
    for q, idxs in ((1.5, [0, 1, 2]), (2.5, [3, 4, 5, 6])):
        body += np.array([q], ">f4").tobytes()
        body += np.uint8(len(idxs)).tobytes()
        body += np.asarray(idxs, ">i4").tobytes()
    path = str(tmp_path / "be.ply")
    with open(path, "wb") as f:
        f.write(header + body)
    data = read_ply(path)["face"]
    np.testing.assert_allclose(data["quality"], [1.5, 2.5])
    assert [list(map(int, r)) for r in data["vertex_indices"]] == [
        [0, 1, 2], [3, 4, 5, 6]
    ]


def test_ply_float_list_property_roundtrip_read(tmp_path):
    """Float list properties must keep their values (pre-fix the packer
    cast uniform lists to int64, silently truncating 0.5 -> 0.0)."""
    header = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element face 2\n"
        b"property list uchar float vals\n"
        b"end_header\n"
    )
    body = b""
    for row in ([0.5, 1.5, 2.25], [3.75, -0.125, 9.0]):
        body += np.uint8(len(row)).tobytes()
        body += np.asarray(row, "<f4").tobytes()
    path = str(tmp_path / "fl.ply")
    with open(path, "wb") as f:
        f.write(header + body)
    vals = read_ply(path)["face"]
    np.testing.assert_allclose(
        vals, [[0.5, 1.5, 2.25], [3.75, -0.125, 9.0]]
    )


def test_ply_write_rejects_float_list_columns(tmp_path):
    from nestinet_tpu.data.ply import write_ply_elements

    with pytest.raises(ValueError, match="list properties"):
        write_ply_elements(
            str(tmp_path / "bad.ply"),
            {"vertex": {"pos": np.zeros((4, 3), np.float32)}},
        )
