"""Worker for the real 2-process `jax.distributed` test.

Launched as a subprocess (one per process rank) by
tests/test_distributed_2proc.py.  Performs the genuine multi-process
recipe the framework documents in `train/distributed.py`: handshake via
jax.distributed.initialize -> global (data,) mesh spanning both
processes' CPU devices -> global batch assembled from process-local
rows -> ONE jitted data-parallel SGD step whose gradient all-reduce is
a real cross-process collective inserted by the SPMD partitioner.

Prints the updated parameters as one JSON line so the parent can check
both ranks agree and match the single-process result.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The machine's sitecustomize pins the axon TPU platform at interpreter
# start; env vars are not enough (same situation as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
# Multi-process CPU needs a cross-host collectives backend: without it
# the CPU client is local-only and jax.process_count() stays 1.  gloo
# ships inside jaxlib.  Must be set before the first backend touch.
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nestinet_tpu.train import distributed
from nestinet_tpu.train.mesh import make_mesh


def main():
    distributed.initialize()  # env: COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
    idx, count = distributed.process_info()
    assert count == 2, f"expected 2 processes, got {count}"
    n_dev = len(jax.devices())

    # one device per process -> 2-device global mesh, data axis only
    mesh = make_mesh(data_parallel=n_dev, expert_parallel=1)

    global_batch = 8
    feat = 4
    rng = np.random.RandomState(0)  # same on both ranks: global dataset
    x_all = rng.randn(global_batch, feat).astype(np.float32)
    y_all = rng.randn(global_batch).astype(np.float32)
    w0 = np.arange(feat, dtype=np.float32) / 10.0

    # Each process uploads ONLY its slice of the global batch.
    sl = distributed.host_batch_slice(global_batch)
    sharding = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(sharding, x_all[sl])
    y = jax.make_array_from_process_local_data(sharding, y_all[sl])
    w = jax.device_put(w0, NamedSharding(mesh, P()))

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean(jnp.square(x @ w - y))

        g = jax.grad(loss_fn)(w)  # mean over the GLOBAL batch: psum across processes
        return w - 0.1 * g

    w1 = step(w, x, y)
    # w1 is replicated: each rank reads its local copy
    print("RESULT " + json.dumps({
        "rank": idx,
        "w": np.asarray(w1.addressable_data(0)).tolist(),
        "n_global_devices": jax.device_count(),
        "n_local_devices": jax.local_device_count(),
    }), flush=True)


if __name__ == "__main__":
    main()
