"""Real 2-process `jax.distributed` handshake + cross-process psum.

VERDICT r1 #6: `train/distributed.py` was only mock-tested.  This test
spawns TWO actual subprocesses that rendezvous through
`jax.distributed.initialize` on the CPU backend, build a global 2-device
mesh, run one jitted data-parallel SGD step (the gradient mean over the
global batch is a genuine cross-process collective), and checks

  * both ranks report 2 global devices / 1 local device,
  * both ranks produce identical updated parameters,
  * those parameters match a single-process numpy computation.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.fast

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "distworker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_step(tmp_path):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        # One plain CPU device per process: drop the virtual-8 XLA flag
        # the in-process conftest sets for this (pytest) interpreter.
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["NUM_PROCESSES"] = "2"
        env["PROCESS_ID"] = str(rank)
        procs.append(
            subprocess.Popen(
                [sys.executable, _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )

    results = {}
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(f"rank {rank} timed out (no rendezvous?)")
        assert p.returncode == 0, f"rank {rank} failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, f"rank {rank} printed no RESULT:\n{out}\n{err}"
        results[rank] = json.loads(line[-1][len("RESULT "):])

    for rank, r in results.items():
        assert r["n_global_devices"] == 2, r
        assert r["n_local_devices"] == 1, r

    w_a = np.asarray(results[0]["w"])
    w_b = np.asarray(results[1]["w"])
    np.testing.assert_allclose(w_a, w_b, rtol=0, atol=0)

    # single-process reference (same data layout as the worker)
    rng = np.random.RandomState(0)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8).astype(np.float32)
    w0 = np.arange(4, dtype=np.float32) / 10.0
    grad = 2.0 * x.T @ (x @ w0 - y) / 8.0
    expected = w0 - 0.1 * grad
    np.testing.assert_allclose(w_a, expected, rtol=1e-5, atol=1e-6)
