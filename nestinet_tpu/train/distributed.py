"""Multi-host (multi-process) initialization and data splitting.

The reference is strictly single-process / single-GPU (SURVEY §2.7).
Scale-out across hosts here follows the standard JAX recipe:

    # on every host, before any backend touch:
    from nestinet_tpu.train import distributed
    distributed.initialize()                  # jax.distributed handshake
    mesh = make_mesh(...)                     # global mesh over ALL chips
    shard = distributed.host_shard(range(n_shapes))   # this host's data

Collectives ride ICI within a slice and DCN across hosts; the SPMD
partitioner inserts them from the same shardings used single-host —
nothing else in the framework changes.
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """`jax.distributed.initialize` with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID); no-op for
    single-process runs so call sites can be unconditional."""
    num = num_processes if num_processes is not None else int(
        os.environ.get("NUM_PROCESSES", "1")
    )
    if num <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("COORDINATOR_ADDRESS"),
        num_processes=num,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("PROCESS_ID", "0")),
    )


def process_info() -> tuple[int, int]:
    """(process_index, process_count)."""
    return jax.process_index(), jax.process_count()


def host_shard(items) -> list:
    """This host's slice of a global work list (shapes, files, ...):
    round-robin by process index, so every host feeds its local chips
    distinct data (the data mesh axis spans all hosts)."""
    idx, count = process_info()
    return [it for i, it in enumerate(items) if i % count == idx]


def host_batch_slice(global_batch: int) -> slice:
    """The row range of a global batch this host should produce when
    assembling per-host arrays for `jax.make_array_from_process_local_data`."""
    idx, count = process_info()
    if global_batch % count:
        raise ValueError(
            f"global batch {global_batch} must divide by process count {count}"
        )
    per = global_batch // count
    return slice(idx * per, (idx + 1) * per)
