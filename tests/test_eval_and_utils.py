import os

import numpy as np
import pytest

from nestinet_tpu.data.depth import depth_to_xyz, world_to_image
from nestinet_tpu.data.rotations import (
    angle_axis2euler,
    euler2angle_axis,
    euler2mat,
    euler2quat,
    mat2euler,
    mat2quat,
    quat2euler,
    quat2mat,
    random_rotation,
)
from nestinet_tpu.eval.metrics import angle_errors_deg, pgp, rms_angle_deg, unoriented_flip
from nestinet_tpu.infer.writer import ShapeScatterWriter
from nestinet_tpu.viz.normals import euclidean_to_spherical, normal2rgb


# ---- metrics ----

def test_angle_errors_exact():
    gt = np.array([[0, 0, 1.0], [0, 0, 1.0], [0, 0, 1.0], [0, 0, 1.0]])
    pred = np.array(
        [
            [0, 0, 1.0],  # 0 deg
            [0, 0, -2.0],  # flipped: unoriented 0, oriented 180
            [0, 1.0, 1.0],  # 45 deg
            [1.0, 0, 0],  # 90 deg
        ]
    )
    ang, ang_o = angle_errors_deg(gt, pred)
    np.testing.assert_allclose(ang, [0, 0, 45, 90], atol=1e-5)
    np.testing.assert_allclose(ang_o, [0, 180, 45, 90], atol=1e-5)
    assert rms_angle_deg(np.array([3.0, 4.0])) == pytest.approx(np.sqrt(12.5))
    assert pgp(ang, 10.0) == pytest.approx(0.5)
    assert pgp(ang, 5.0) == pytest.approx(0.5)


def test_unoriented_flip():
    gt = np.array([[0, 0, 1.0], [0, 0, 1.0]])
    pred = np.array([[0, 0, -1.0], [0, 0, 1.0]])
    flipped = unoriented_flip(pred, gt)
    np.testing.assert_allclose(flipped, [[0, 0, 1.0], [0, 0, 1.0]], atol=1e-12)


# ---- rotations ----

def test_euler_roundtrip(rng):
    for _ in range(20):
        z, y, x = rng.uniform(-np.pi / 2 + 0.1, np.pi / 2 - 0.1, 3)
        m = euler2mat(z=z, y=y, x=x)
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(m) == pytest.approx(1.0)
        z2, y2, x2 = mat2euler(m)
        np.testing.assert_allclose([z, y, x], [z2, y2, x2], atol=1e-9)


def test_quat_roundtrip(rng):
    for _ in range(10):
        z, y, x = rng.uniform(-1, 1, 3)
        m = euler2mat(z=z, y=y, x=x)
        q = mat2quat(m)
        np.testing.assert_allclose(quat2mat(q), m, atol=1e-9)
        q2 = euler2quat(z=z, y=y, x=x)
        np.testing.assert_allclose(np.abs(np.dot(q, q2)), 1.0, atol=1e-9)


def test_quat2euler_and_angle_axis_roundtrips(rng):
    for _ in range(10):
        z, y, x = rng.uniform(-np.pi / 2 + 0.1, np.pi / 2 - 0.1, 3)
        np.testing.assert_allclose(
            quat2euler(euler2quat(z=z, y=y, x=x)), [z, y, x], atol=1e-9
        )
        theta, vec = euler2angle_axis(z=z, y=y, x=x)
        assert np.linalg.norm(vec) == pytest.approx(1.0)
        np.testing.assert_allclose(
            angle_axis2euler(theta, vec, is_normalized=True), [z, y, x], atol=1e-9
        )
        # unnormalized axis input is normalized internally
        np.testing.assert_allclose(
            angle_axis2euler(theta, 3.7 * vec), [z, y, x], atol=1e-9
        )
    # identity rotation edge case
    theta, vec = euler2angle_axis(0.0, 0.0, 0.0)
    assert theta == pytest.approx(0.0)
    np.testing.assert_allclose(angle_axis2euler(0.0, [0.0, 0.0, 0.0]), [0, 0, 0])


def test_random_rotation_is_orthonormal(rng):
    r = random_rotation(rng)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(r) == pytest.approx(1.0)


# ---- depth ingestion ----

def test_depth_to_xyz_roundtrip(rng):
    h, w = 12, 16
    fx, fy, cx, cy = 10.0, 11.0, 8.0, 6.0
    intrinsic = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    pose = np.eye(4)
    pose[:3, :3] = euler2mat(z=0.3, y=-0.2, x=0.1)
    pose[:3, 3] = [1.0, -2.0, 0.5]

    depth = rng.uniform(1.0, 3.0, size=(h, w))
    depth[0, 0] = 0  # invalid pixel must be dropped
    pts = depth_to_xyz(depth, intrinsic, pose, apply_translation=True)
    assert pts.shape == (h * w - 1, 3)

    # project back: each point must land on its source pixel
    img = world_to_image(pts, pts, (h, w), intrinsic, pose)
    ys, xs = np.nonzero(depth != 0)
    hit = np.any(img != 0, axis=2)
    assert hit.sum() == len(pts)


def test_world_to_image_bounds(rng):
    intrinsic = np.eye(3)
    pose = np.eye(4)
    pts = np.array([[100.0, 100.0, 1.0], [0.5, 0.5, 1.0]])
    prop = np.array([[1.0, 0, 0], [0, 1.0, 0]])
    img = world_to_image(pts, prop, (4, 4), intrinsic, pose)
    # the far point is out of bounds, the near one lands in the image
    assert img.sum() == pytest.approx(1.0)


# ---- viz helpers ----

def test_normal2rgb_and_spherical():
    n = np.array([[0, 0, 1.0], [1.0, 0, 0], [0, -1.0, 0]])
    rgb = normal2rgb(n)
    assert rgb.min() >= 0 and rgb.max() <= 1
    np.testing.assert_allclose(rgb[0], [0.5, 0.5, 1.0])
    phi, theta = euclidean_to_spherical(n)
    np.testing.assert_allclose(theta, [0, 90, 90], atol=1e-9)
    np.testing.assert_allclose(phi[1:], [0, -90], atol=1e-9)


# ---- writer ----

def test_shape_scatter_writer(tmp_path):
    out = str(tmp_path / "results")
    writer = ShapeScatterWriter(out, ["a", "b"], [5, 3], n_experts=2)
    normals = np.arange(24, dtype=np.float64).reshape(8, 3)
    experts = np.arange(8) % 2
    probs = np.tile([[0.25, 0.75]], (8, 1))

    # feed in uneven chunks crossing the shape boundary
    writer.append(normals[:2], experts[:2], probs[:2])
    assert not writer.done
    writer.append(normals[2:7], experts[2:7], probs[2:7])
    writer.append(normals[7:], experts[7:], probs[7:])
    assert writer.done

    a = np.loadtxt(os.path.join(out, "a.normals"))
    b = np.loadtxt(os.path.join(out, "b.normals"))
    np.testing.assert_allclose(a, normals[:5])
    np.testing.assert_allclose(b, normals[5:])
    ea = np.loadtxt(os.path.join(out, "a.experts"))
    np.testing.assert_allclose(ea, experts[:5])
    pa = np.loadtxt(os.path.join(out, "a.experts_probs"))
    assert pa.shape == (5, 2)


def test_async_shape_writer_matches_sync(tmp_path):
    from nestinet_tpu.infer.writer import AsyncShapeWriter

    out = str(tmp_path / "results")
    writer = AsyncShapeWriter(ShapeScatterWriter(out, ["a", "b"], [5, 3]))
    normals = np.arange(24, dtype=np.float64).reshape(8, 3)
    writer.append(normals[:2])
    writer.append(normals[2:7])
    writer.append(normals[7:])
    writer.close()
    assert writer.writer.done
    np.testing.assert_allclose(
        np.loadtxt(os.path.join(out, "a.normals")), normals[:5]
    )
    np.testing.assert_allclose(
        np.loadtxt(os.path.join(out, "b.normals")), normals[5:]
    )


def test_async_shape_writer_surfaces_worker_error(tmp_path):
    """A worker exception re-raises on close() and never deadlocks
    put() even when appends keep coming past a small queue bound."""
    import pytest

    from nestinet_tpu.infer.writer import AsyncShapeWriter

    class Boom:
        def append(self, *a):
            raise ValueError("boom")

    writer = AsyncShapeWriter(Boom(), maxsize=2)
    with pytest.raises(RuntimeError, match="async shape writer"):
        for _ in range(50):  # > maxsize: would deadlock without draining
            writer.append(np.zeros((1, 3)))
        writer.close()


# ---- augmentations ----

def test_augmentations(rng):
    from nestinet_tpu.data import augment
    from nestinet_tpu.ops.gmm import get_3d_grid_gmm

    batch = rng.randn(4, 64, 3).astype(np.float32)
    normals = rng.randn(4, 3).astype(np.float32)

    pts2, n2 = augment.rotate_patches_and_normals(batch, normals, rng)
    # rotation preserves norms and relative angles
    np.testing.assert_allclose(
        np.linalg.norm(pts2, axis=2), np.linalg.norm(batch, axis=2), atol=1e-4
    )
    np.testing.assert_allclose(
        np.einsum("bnd,bd->bn", pts2, n2),
        np.einsum("bnd,bd->bn", batch, normals),
        atol=1e-3,
    )

    assert augment.rotate_y(batch, rng).shape == batch.shape
    assert augment.translate(batch, rng).shape == batch.shape
    assert augment.anisotropic_scale(batch, rng).shape == batch.shape
    assert augment.jitter(batch, rng).shape == batch.shape
    out = augment.insert_outliers(batch, rng, 0.05)
    assert out.shape[1] == 64  # ceil(0.95*64)=61 kept + 3 outliers
    occ = augment.occlude(batch, rng, 0.25)
    assert occ.shape == (4, 48, 3)
    gmm = get_3d_grid_gmm([3, 3, 3], 0.111)
    st = augment.starve_gaussians(batch, gmm, rng, n_points=32)
    assert st.shape == (4, 32, 3)


def test_evaluate_dense_predictions_full_shape(tmp_path):
    """sparse_patches=False with dense predictions evaluates every point
    (the reference crashed on this combination, evaluate.py:127-132)."""
    import os

    from nestinet_tpu.eval.evaluate import evaluate_dataset

    rng = np.random.RandomState(0)
    n = 100
    nrm = rng.randn(n, 3)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    data, results = tmp_path / "d", tmp_path / "r"
    data.mkdir(); results.mkdir()
    np.savetxt(data / "s.xyz", rng.randn(n, 3))
    np.savetxt(data / "s.normals", nrm)
    np.savetxt(data / "s.pidx", rng.choice(n, 10, replace=False), fmt="%d")
    (data / "mini.txt").write_text("s\n")
    np.savetxt(results / "s.normals", -nrm)  # dense, sign-flipped

    full = evaluate_dataset(str(data), str(results), "mini",
                            sparse_patches=False, log=lambda s: None)
    sub = evaluate_dataset(str(data), str(results), "mini",
                           sparse_patches=True, log=lambda s: None)
    assert full["rms"] < 1e-3 and sub["rms"] < 1e-3


def test_opt_state_shardings_moe():
    """Optimizer moments follow their parameters' shardings; counters
    replicate (train/mesh.py::opt_state_shardings, round 5)."""
    import jax
    import jax.numpy as jnp
    import optax

    from nestinet_tpu.train.mesh import (
        EXPERT_AXIS,
        make_mesh,
        moe_param_shardings,
        opt_state_shardings,
        replicated,
    )

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(2, 2)
    params = {
        "group0": {"w": jnp.zeros((4, 8)), "b": jnp.zeros((4,))},
        "manager": {"w": jnp.zeros((8, 8))},
    }
    p_sh = moe_param_shardings(params, mesh)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    o_sh = opt_state_shardings(opt, p_sh, mesh)

    flat_o, _ = jax.tree_util.tree_flatten(opt)
    flat_sh = jax.tree.leaves(o_sh)
    assert len(flat_o) == len(flat_sh)
    rep = replicated(mesh)
    n_ep = 0
    for leaf, sh in zip(flat_o, flat_sh):
        if leaf.ndim == 0:
            assert sh.is_equivalent_to(rep, 1)
        elif leaf.shape[:1] == (4,):  # group0 stack leaves
            from jax.sharding import NamedSharding, PartitionSpec as P

            assert sh.is_equivalent_to(
                NamedSharding(mesh, P(EXPERT_AXIS)), leaf.ndim
            )
            n_ep += 1
    # adam: mu + nu each contain w[4,8] and b[4]
    assert n_ep == 4


def test_capacity_bucket_granularity():
    from nestinet_tpu.infer.device_pipeline import _capacity_bucket

    assert _capacity_bucket(1) == 64
    assert _capacity_bucket(64) == 64
    assert _capacity_bucket(65) == 128
    assert _capacity_bucket(268) == 384
    assert _capacity_bucket(805) == 896
    assert _capacity_bucket(896) == 896
    assert _capacity_bucket(897) == 1024
