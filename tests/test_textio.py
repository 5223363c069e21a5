"""Byte-identity tests for the native text writer (core/textio.py).

The serving writers must produce results files identical to
np.savetxt's (the reference writes its outputs that way —
test_n_est_w_experts.py:188-196), so the C fast path is pinned
byte-for-byte against np.savetxt, including sign/denormal edge cases.
"""

import io

import numpy as np
import pytest

from nestinet_tpu.core import textio


def _np_bytes(arr, fmt="%.18e"):
    buf = io.StringIO()
    np.savetxt(buf, arr, fmt=fmt)
    return buf.getvalue()


EDGE = np.array(
    [
        [0.0, -0.0, 1.0],
        [-1.0, 1e-300, -1e300],
        [5e-324, 2.2250738585072014e-308, 1.7976931348623157e308],
        [1 / 3, -2 / 3, 123456.789],
    ]
)


@pytest.mark.parametrize(
    "arr",
    [
        np.random.RandomState(0).randn(257, 3),
        np.random.RandomState(1).rand(100, 7),
        EDGE,
        np.random.RandomState(2).randn(64),  # 1-D float column
    ],
)
def test_float_table_matches_savetxt(tmp_path, arr):
    p = str(tmp_path / "t.txt")
    textio.savetxt(p, arr)
    assert open(p).read() == _np_bytes(arr)


def test_int_column_matches_savetxt(tmp_path):
    ids = np.array([0, 6, -3, 2**40, -(2**40), 1], np.int64)
    p = str(tmp_path / "i.txt")
    textio.savetxt(p, ids, fmt="%i")
    assert open(p).read() == _np_bytes(ids.astype(int), fmt="%i")


def test_native_library_builds():
    # The serving host has g++ (native/patch_sampler.cpp relies on it
    # too); if this fails the writers still work via the fallback, but
    # the host-tail win is gone — keep it visible.
    assert textio.get_library() is not None


def test_fallback_without_library(tmp_path, monkeypatch):
    monkeypatch.setattr(textio, "get_library", lambda: None)
    arr = np.random.RandomState(3).randn(10, 3)
    p = str(tmp_path / "f.txt")
    textio.savetxt(p, arr)
    assert open(p).read() == _np_bytes(arr)


def test_unusual_fmt_delegates(tmp_path):
    arr = np.random.RandomState(4).rand(5, 2)
    p = str(tmp_path / "u.txt")
    textio.savetxt(p, arr, fmt="%.3f")
    assert open(p).read() == _np_bytes(arr, fmt="%.3f")


def test_shape_writer_files_byte_identical(tmp_path):
    from nestinet_tpu.infer.writer import ShapeScatterWriter

    rng = np.random.RandomState(5)
    normals = rng.randn(30, 3)
    experts = rng.randint(0, 7, 30).astype(np.int64)
    probs = rng.rand(30, 7)
    w = ShapeScatterWriter(str(tmp_path), ["s"], [30], n_experts=7)
    w.append(normals, experts, probs)
    assert w.done
    assert open(tmp_path / "s.normals").read() == _np_bytes(
        normals.astype(np.float64)
    )
    assert open(tmp_path / "s.experts").read() == _np_bytes(
        experts.astype(int), fmt="%i"
    )
    assert open(tmp_path / "s.experts_probs").read() == _np_bytes(
        probs.astype(np.float64)
    )
