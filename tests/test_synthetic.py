"""Synthetic PCPNet-protocol benchmark (data/synthetic.py).

Pins: analytic normals are unit and orthogonal to the local surface
(checked against finite differences / known geometry), noise respects
the sigma * bbox-diagonal convention, density transforms actually thin
the cloud, and the builder writes the exact PCPNet list layout the
evaluator consumes (`/root/reference/utils/evaluate.py:40-41,106-109`).
"""

import os

import numpy as np
import pytest

from nestinet_tpu.data import synthetic as syn

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("name", sorted(syn.SHAPE_GENERATORS))
def test_normals_unit(name, rng):
    pts, nrm = syn.SHAPE_GENERATORS[name](2000, rng)
    assert pts.shape == nrm.shape == (2000, 3)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-6)


def test_sphere_torus_normals_analytic(rng):
    pts, nrm = syn.sphere(1000, rng, radius=1.0)
    np.testing.assert_allclose(pts, nrm, atol=1e-6)  # radial

    pts, nrm = syn.torus(1000, rng, R=0.7, r=0.3)
    # point = center-circle point + r * normal
    ring = pts - 0.3 * nrm
    np.testing.assert_allclose(
        np.linalg.norm(ring[:, :2], axis=1), 0.7, atol=1e-6
    )
    np.testing.assert_allclose(ring[:, 2], 0.0, atol=1e-6)


def test_graph_surface_normals_orthogonal(rng):
    """Normals of graph surfaces are orthogonal to tangent finite diffs."""
    for gen in (syn.saddle, syn.ripple):
        pts, nrm = gen(500, rng)
        x, y = pts[:, 0], pts[:, 1]
        eps = 1e-5
        if gen is syn.saddle:
            f = lambda x, y: 0.6 * (x ** 2 - y ** 2)
        else:
            f = lambda x, y: 0.25 * np.sin(2.5 * x) * np.cos(2.5 * y)
        tx = np.stack([np.full_like(x, eps), np.zeros_like(x),
                       f(x + eps, y) - f(x, y)], 1)
        dots = np.abs(np.sum(nrm * tx, axis=1)) / np.linalg.norm(tx, axis=1)
        assert np.max(dots) < 1e-3


def test_white_noise_scale(rng):
    pts, _ = syn.sphere(20000, rng)
    noisy = syn.add_white_noise(pts, 0.006, np.random.RandomState(0))
    d = np.linalg.norm(noisy - pts, axis=1)
    diag = syn.bbox_diagonal(pts)
    # E[|N(0, sigma^2 I_3)|] = sigma * sqrt(8/pi) with sigma = 0.006*diag
    expected = 0.006 * diag * np.sqrt(8 / np.pi)
    assert abs(d.mean() - expected) / expected < 0.05


def test_density_transforms_thin(rng):
    pts, nrm = syn.plane(20000, rng)
    gpts, gnrm = syn.density_gradient(pts, nrm, np.random.RandomState(0))
    assert gpts.shape == gnrm.shape and 0.3 < gpts.shape[0] / 20000 < 0.8
    # the sparse end keeps far fewer points than the dense end
    lo = (gpts[:, 0] > 0.6).sum()
    hi = (gpts[:, 0] < -0.6).sum()
    assert lo < 0.5 * hi

    spts, snrm = syn.density_striped(pts, nrm, np.random.RandomState(0))
    assert 0.3 < spts.shape[0] / 20000 < 0.8


def test_builder_layout(tmp_path):
    sets = syn.build_protocol_benchmark(
        str(tmp_path), n_points=400, n_pidx=50, seed=5
    )
    assert set(ts + ".txt" for ts in syn.TESTSETS) <= set(sets)
    assert "trainingset_whitenoise.txt" in sets
    for list_name, names in sets.items():
        listed = open(os.path.join(tmp_path, list_name)).read().split()
        assert listed == names
        for n in names:
            for ext in (".xyz", ".normals", ".pidx"):
                assert os.path.isfile(os.path.join(tmp_path, n + ext)), (n, ext)
            pts = np.loadtxt(os.path.join(tmp_path, n + ".xyz"))
            nrm = np.loadtxt(os.path.join(tmp_path, n + ".normals"))
            assert pts.shape == nrm.shape
    # noisy testsets share ground truth with the clean points
    clean = np.loadtxt(os.path.join(tmp_path, "sphere_t.normals"))
    noisy = np.loadtxt(os.path.join(tmp_path, "sphere_t_wn_medium.normals"))
    np.testing.assert_allclose(clean, noisy)

    # train/val lists carry per-shape noise sigmas for the switching
    # trainer (`<list>_noise_levels.txt`, pcpnet_dataset.py:223-233)
    for list_name in ("trainingset_whitenoise.txt", "validationset.txt"):
        names = sets[list_name]
        levels = np.loadtxt(
            os.path.join(tmp_path, list_name[:-4] + "_noise_levels.txt")
        )
        assert levels.shape == (len(names),)
        for n, lvl in zip(names, levels):
            if n.endswith("_noise_med"):
                assert lvl == syn.NOISE_LEVELS["medium"]
            elif n.endswith("_noise_lrg"):
                assert lvl == syn.NOISE_LEVELS["large"]
            else:
                assert lvl == 0.0


def test_switching_benchmark_layout(tmp_path):
    """The switching regime carries sigmas on BOTH sides of the 0.015
    hard-switch threshold (ms_sw_n_est.py:82) in every list, with the
    per-shape noise files the trainer's `noise` feature reads."""
    sets = syn.build_switching_benchmark(
        str(tmp_path), n_points=400, n_pidx=50, seed=5
    )
    assert set(sets) == {
        "trainingset_switching.txt",
        "validationset_switching.txt",
        "testset_switching.txt",
    }
    assert any(s < 0.015 for s in syn.SWITCH_NOISE_LEVELS)
    assert any(s > 0.015 for s in syn.SWITCH_NOISE_LEVELS)
    for list_name, names in sets.items():
        listed = open(os.path.join(tmp_path, list_name)).read().split()
        assert listed == names
        levels = np.loadtxt(
            os.path.join(tmp_path, list_name[:-4] + "_noise_levels.txt")
        )
        assert levels.shape == (len(names),)
        # every base shape appears at every sigma, below AND above 0.015
        assert sorted(set(np.round(levels, 6))) == sorted(
            syn.SWITCH_NOISE_LEVELS
        )
        for n in names:
            for ext in (".xyz", ".normals", ".pidx"):
                assert os.path.isfile(os.path.join(tmp_path, n + ext)), (n, ext)
    # GT normals at every sigma are the clean-surface normals
    base = sets["testset_switching.txt"][0].rsplit("_sw", 1)[0]
    clean = np.loadtxt(os.path.join(tmp_path, f"{base}_sw000.normals"))
    noisy = np.loadtxt(os.path.join(tmp_path, f"{base}_sw030.normals"))
    np.testing.assert_allclose(clean, noisy)
