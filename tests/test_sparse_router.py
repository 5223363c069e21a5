"""SparseMoeRouter invariants with a stub model (no CNN compiles).

The router's correctness hinges on one association: the normal written
for patch i must come from the FIFO grid row parked for patch i — even
when buckets are force-flushed by slot eviction, the manager queue is
drained DEPTH batches behind dispatch, and partial buckets pad with
row 0.  These tests encode the global patch index into its grid row and
verify the writer output end to end on a tiny window (W=3) so eviction
and wraparound happen many times.
"""

import os
import types

import jax.numpy as jnp
import numpy as np
import pytest

from nestinet_tpu.infer.predict import SparseMoeRouter
from nestinet_tpu.infer.writer import ShapeScatterWriter


class _Group:
    def __init__(self):
        self.starts = [0]
        self.channels = 20
        self.indices = [0, 1]
        self.n_scales = 1


def _stub_model():
    m = types.SimpleNamespace()
    m.resolution = 2
    m.compute_dtype = jnp.float32
    m.cfg = types.SimpleNamespace(n_scales=1)
    m.n_experts = 2
    m.groups = [_Group()]
    m.expert_to_group = lambda: {0: (0, 0), 1: (0, 1)}
    # fake program B: gather the bucketed rows and return their first
    # three values (the encoded patch id), shifted by the member id so
    # the test can also check the right expert ran.
    def expert_on_buf(params, state, buf, flat_idx, member):
        flat = buf.reshape(-1, buf.shape[-1])
        rows = flat[flat_idx]
        return rows[:, :3] + jnp.float32(member) * 1000.0

    m._serving_jits = {
        "expert_on_buf_0": expert_on_buf,
    }
    return m


@pytest.mark.parametrize("n_patches,batch_size,window", [(97, 4, 3), (64, 8, 2)])
def test_router_association_across_evictions(tmp_path, n_patches, batch_size, window):
    model = _stub_model()
    cfg = types.SimpleNamespace(n_scales=1, n_experts=2)
    out_dir = str(tmp_path / "out")
    writer = ShapeScatterWriter(out_dir, ["s"], [n_patches], n_experts=2)
    router = SparseMoeRouter(
        model, params=None, state=None, cfg=cfg, writer=writer,
        batch_size=batch_size, window_slots=window,
    )

    rng = np.random.RandomState(0)
    route = rng.randint(0, 2, size=n_patches)  # expert per patch
    row_len = router.buf.shape[-1]

    import time

    t0 = time.perf_counter()
    i = 0
    while i < n_patches:
        real = min(batch_size, n_patches - i)
        slot = router.begin_batch()
        # program A substitute: park grid rows encoding each patch's
        # global index; emit probs that route patch j to route[j].
        grid = np.zeros((batch_size, row_len), np.float32)
        for r in range(real):
            grid[r, :3] = i + r
        buf = router.buf.at[int(slot)].set(jnp.asarray(grid))
        probs = np.zeros((2, batch_size), np.float32)
        for r in range(real):
            probs[route[i + r], r] = 1.0
        router.commit(real, jnp.asarray(probs), buf)
        i += real
    stats = router.finish(t0, out_dir)

    assert stats["n_patches"] == n_patches
    normals = np.loadtxt(os.path.join(out_dir, "s.normals"))
    experts = np.loadtxt(os.path.join(out_dir, "s.experts"))
    probs_out = np.loadtxt(os.path.join(out_dir, "s.experts_probs"))
    assert normals.shape == (n_patches, 3)
    # association: row i encodes patch id i (+1000 if expert member 1 ran)
    expect = np.arange(n_patches)[:, None] + route[:, None] * 1000.0
    np.testing.assert_allclose(normals, np.broadcast_to(expect, (n_patches, 3)))
    np.testing.assert_array_equal(experts, route)
    np.testing.assert_allclose(probs_out[np.arange(n_patches), route], 1.0)
