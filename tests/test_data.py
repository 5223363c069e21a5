import numpy as np
import pytest
from scipy import spatial

from nestinet_tpu.data.dataset import (
    PatchDataset,
    RandomPatchSampler,
    SequentialPatchSampler,
    SequentialShapeRandomPatchSampler,
)
from nestinet_tpu.data.loader import BatchIterator, get_data_loader

from .fixtures import make_plane, make_sphere, write_pcpnet_dataset

RADII = [0.05, 0.1]
N_PER_PATCH = 32


@pytest.fixture
def dataset_dir(tmp_path, rng):
    root = str(tmp_path / "pcpnet")
    plane = make_plane(500, rng)
    sphere = make_sphere(400, rng)
    write_pcpnet_dataset(root, {"plane": plane, "sphere": sphere})
    return root


def _make_dataset(root, **kw):
    defaults = dict(
        root=root,
        shape_list_filename="trainingset.txt",
        patch_radius=RADII,
        points_per_patch=N_PER_PATCH,
        features=("normal",),
        seed=3627473,
    )
    defaults.update(kw)
    return PatchDataset(**defaults)


def test_dataset_basic(dataset_dir):
    ds = _make_dataset(dataset_dir)
    assert ds.shape_names == ["plane", "sphere"]
    assert ds.shape_patch_count == [500, 400]
    assert len(ds) == 900
    # global index -> (shape, patch)
    assert ds.shape_index(0) == (0, 0)
    assert ds.shape_index(499) == (0, 499)
    assert ds.shape_index(500) == (1, 0)
    assert ds.shape_index(899) == (1, 399)


def test_patch_semantics(dataset_dir):
    ds = _make_dataset(dataset_dir)
    item = ds[42]
    pts, n_eff = item["points"], item["n_eff"]
    assert pts.shape == (2 * N_PER_PATCH, 3)
    assert pts.dtype == np.float32
    assert n_eff.shape == (2,)

    # verify counts against a direct scipy query
    raw = np.loadtxt(dataset_dir + "/plane.xyz")
    tree = spatial.cKDTree(raw, 10)
    diag = np.linalg.norm(raw.max(0) - raw.min(0))
    for s, frac in enumerate(RADII):
        expect = min(N_PER_PATCH, len(tree.query_ball_point(raw[42], frac * diag)))
        assert n_eff[s] == expect

        # all real rows lie within the (scaled) unit ball; padding is zero
        start = s * N_PER_PATCH
        real = pts[start : start + n_eff[s]]
        assert np.all(np.linalg.norm(real, axis=1) <= 1.0 + 1e-5)
        pad = pts[start + n_eff[s] : start + N_PER_PATCH]
        assert np.all(pad == 0)

    # ground-truth normal of the plane
    np.testing.assert_allclose(item["normals"], [0, 0, 1], atol=1e-6)


def test_patch_centering_modes(dataset_dir):
    for center in ("point", "mean", "none"):
        ds = _make_dataset(dataset_dir, center=center)
        item = ds[10]
        n_eff = item["n_eff"]
        for s in range(2):
            real = item["points"][s * N_PER_PATCH : s * N_PER_PATCH + n_eff[s]]
            if center == "mean":
                np.testing.assert_allclose(real.mean(0), 0.0, atol=1e-5)
            elif center == "point":
                # the query point itself maps to the origin
                assert np.any(np.all(np.abs(real) < 1e-6, axis=1))


def test_identical_epochs_reproducibility(dataset_dir):
    ds1 = _make_dataset(dataset_dir, identical_epochs=True)
    ds2 = _make_dataset(dataset_dir, identical_epochs=True)
    for idx in (3, 77, 512):
        np.testing.assert_array_equal(ds1[idx]["points"], ds2[idx]["points"])


def test_epoch_changes_subsample(dataset_dir):
    """Without identical_epochs, the random subset drawn for an
    over-populated patch changes across epochs."""
    ds = _make_dataset(dataset_dir, points_per_patch=8)
    a = ds[0]["points"].copy()
    ds.set_epoch(1)
    b = ds[0]["points"]
    assert not np.array_equal(a, b)


def test_pca_alignment(dataset_dir, rng):
    ds = _make_dataset(dataset_dir, use_pca=True)
    item = ds[5]
    trans = item["trans"]
    # trans is a rotation-ish orthonormal matrix
    np.testing.assert_allclose(trans @ trans.T, np.eye(3), atol=1e-4)
    # plane patches align so the thin (z) axis is the last PCA direction:
    # the ground-truth normal in PCA frame should be +-e3
    n = item["normals"]
    np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-3)


def test_sparse_patches(dataset_dir):
    ds = _make_dataset(dataset_dir, sparse_patches=True)
    assert ds.shape_patch_count == [50, 50]
    pidx = np.loadtxt(dataset_dir + "/plane.pidx").astype(int)
    item = ds[0]
    raw = np.loadtxt(dataset_dir + "/plane.normals")
    np.testing.assert_allclose(item["normals"], raw[pidx[0]], atol=1e-6)


def test_noise_levels(dataset_dir):
    with open(dataset_dir + "/trainingset_noise_levels.txt", "w") as f:
        f.write("0.01\n0.05\n")
    ds = _make_dataset(dataset_dir, features=("normal", "noise"))
    assert ds[0]["noise"] == np.float32(0.01)
    assert ds[500]["noise"] == np.float32(0.05)


def test_samplers(dataset_dir):
    ds = _make_dataset(dataset_dir)

    seq = SequentialPatchSampler(ds)
    assert list(seq) == list(range(900))

    rnd = RandomPatchSampler(ds, patches_per_shape=100, seed=1, identical_epochs=True)
    idx1, idx2 = list(rnd), list(rnd)
    assert len(idx1) == 200
    assert idx1 == idx2  # identical epochs
    assert len(set(idx1)) == len(idx1)  # no replacement

    rnd2 = RandomPatchSampler(ds, patches_per_shape=100, seed=1, identical_epochs=False)
    a, b = list(rnd2), list(rnd2)
    assert a != b

    con = SequentialShapeRandomPatchSampler(
        ds, patches_per_shape=50, seed=2, identical_epochs=True
    )
    order = list(con)
    assert len(order) == 100
    # patches of one shape stay consecutive
    shape_of = [0 if i < 500 else 1 for i in order]
    switches = sum(1 for i in range(1, 100) if shape_of[i] != shape_of[i - 1])
    assert switches == 1


def test_batch_iterator(dataset_dir):
    ds = _make_dataset(dataset_dir)
    sampler = RandomPatchSampler(ds, patches_per_shape=40, seed=1, identical_epochs=True)
    it = BatchIterator(ds, sampler, batch_size=16)
    batches = list(it)
    assert len(it) == 5
    assert len(batches) == 5
    assert batches[0]["points"].shape == (16, 2 * N_PER_PATCH, 3)
    assert batches[0]["n_eff"].shape == (16, 2)
    assert batches[0]["normals"].shape == (16, 3)

    # threaded workers produce identical batches (per-item rng is
    # index-keyed, so parallelism cannot change the data)
    it_mt = BatchIterator(ds, sampler, batch_size=16, workers=4)
    for a, b in zip(batches, it_mt):
        np.testing.assert_array_equal(a["points"], b["points"])


def test_get_data_loader_factory(dataset_dir):
    loader, ds = get_data_loader(
        "trainingset.txt",
        indir=dataset_dir,
        batch_size=8,
        patch_radius=RADII,
        points_per_patch=N_PER_PATCH,
        outputs=("unoriented_normals",),
        patches_per_shape=24,
        patch_sample_order="random",
        identical_epochs=True,
    )
    batch = next(iter(loader))
    assert set(batch) >= {"points", "n_eff", "normals"}
    assert batch["points"].shape == (8, 2 * N_PER_PATCH, 3)


def test_modelnet_h5_roundtrip(tmp_path):
    """ModelNet-style h5 loaders (library parity with the reference's
    legacy classification loaders)."""
    import h5py

    from nestinet_tpu.data import modelnet

    rng = np.random.RandomState(0)
    data = rng.randn(10, 64, 3).astype(np.float32)
    label = rng.randint(0, 40, size=(10, 1))
    normal = rng.randn(10, 64, 3).astype(np.float32)
    path = str(tmp_path / "f0.h5")
    with h5py.File(path, "w") as f:
        f["data"] = data
        f["label"] = label
        f["normal"] = normal
        f["pid"] = label.repeat(64, axis=1)
    manifest = tmp_path / "files.txt"
    manifest.write_text("f0.h5\n")

    files = modelnet.get_data_files(str(manifest))
    assert files == [path]
    d, l = modelnet.load_h5(path)
    np.testing.assert_array_equal(d, data)
    d, l, nrm = modelnet.load_h5_with_normals(path)
    np.testing.assert_array_equal(nrm, normal)
    d, l, seg = modelnet.load_h5_with_seg(path)
    assert seg.shape == (10, 64)

    batches = list(modelnet.iter_batches(data, label[:, 0], 4, seed=1))
    assert len(batches) == 2 and batches[0][0].shape == (4, 64, 3)
    sd, sl, idx = modelnet.shuffle_data(data, label[:, 0], seed=1)
    np.testing.assert_array_equal(sd, data[idx])


def test_point_tuple_parity(dataset_dir):
    """`point_tuple` parity with `pcpnet_dataset.py:380-404`: per scale,
    the count^T ordered tuples of the patch's processed points (uniform
    without-replacement subset when they exceed points_per_patch), rows
    beyond the tuple count zero, n_eff unchanged.  The expected result
    is rebuilt here from the single-point output with the same item RNG
    protocol (tuple draw = the draw after the ball-subsample draws)."""
    T = 2
    ds = _make_dataset(dataset_dir, point_tuple=T, use_native=False)
    assert not ds.use_native  # tuples force the scipy path
    base = _make_dataset(dataset_dir, use_native=False)

    # a near-empty-ball dataset exercises the exhaustive (count^T <= N)
    # branch, where the tuples enumerate ALL pairs in unravel order
    tiny = _make_dataset(
        dataset_dir, point_tuple=T, use_native=False, patch_radius=[0.004, 0.1]
    )
    tiny_base = _make_dataset(
        dataset_dir, use_native=False, patch_radius=[0.004, 0.1]
    )

    checked_subsampled = checked_exhaustive = False
    for index, ds, base in (
        (0, ds, base), (42, ds, base), (563, ds, base), (700, ds, base),
        (0, tiny, tiny_base), (563, tiny, tiny_base),
    ):
        item = ds[index]
        single = base[index]
        pts, n_eff = item["points"], item["n_eff"]
        assert pts.shape == (2 * N_PER_PATCH, 3 * T)
        assert np.array_equal(n_eff, single["n_eff"])

        # reference-style reconstruction from the single-point patch
        rng = ds._item_rng(index)
        shape_ind, patch_ind = ds.shape_index(index)
        shape = ds.shape_cache.get(shape_ind)
        center = shape.pts[patch_ind]
        expected = np.zeros((2 * N_PER_PATCH, 3 * T), np.float32)
        counts = []
        for rad in ds.patch_radius_absolute[shape_ind]:
            inds = shape.kdtree.query_ball_point(center, rad)
            count = min(N_PER_PATCH, len(inds))
            if count < len(inds):  # consume the ball-subsample draw
                rng.choice(len(inds), count, replace=False)
            counts.append(count)
        for s, count in enumerate(counts):
            start = s * N_PER_PATCH
            tuple_count = count**T
            if tuple_count > N_PER_PATCH:
                lin = rng.choice(tuple_count, N_PER_PATCH, replace=False)
                tuple_count = N_PER_PATCH
                checked_subsampled = True
            else:
                lin = np.arange(tuple_count)
                checked_exhaustive = True
            multi = np.unravel_index(lin, (count,) * T)
            for t in range(T):
                expected[start : start + tuple_count, 3 * t : 3 * (t + 1)] = (
                    single["points"][start + multi[t]]
                )
        np.testing.assert_array_equal(pts, expected)

        # every tuple element is a real (processed) patch point
        for s in range(2):
            rows = pts[s * N_PER_PATCH : (s + 1) * N_PER_PATCH]
            live = rows[np.any(rows != 0, axis=1)]
            patch = single["points"][s * N_PER_PATCH : (s + 1) * N_PER_PATCH]
            patch = patch[: single["n_eff"][s]]
            for t in range(T):
                elem = live[:, 3 * t : 3 * (t + 1)]
                if elem.shape[0] == 0:
                    continue  # empty ball at this scale
                d = np.linalg.norm(elem[:, None] - patch[None], axis=-1)
                assert d.min(axis=1).max() == 0.0
    assert checked_subsampled and checked_exhaustive


def test_point_tuple_via_loader(dataset_dir):
    loader, dataset = get_data_loader(
        "trainingset.txt", indir=dataset_dir, batch_size=8,
        patch_radius=RADII, points_per_patch=N_PER_PATCH,
        outputs=("unoriented_normals",), seed=3627473, point_tuple=3,
        patch_sample_order="full", workers=0,
    )
    batch = next(iter(loader))
    assert batch["points"].shape == (8, 2 * N_PER_PATCH, 9)
    assert np.isfinite(batch["points"]).all()
