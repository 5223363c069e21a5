#!/bin/bash
# Warm the persistent XLA compilation cache (.jax_cache) for the
# multi-chip dryrun so the driver's budgeted run deserializes compiled
# executables instead of paying the multi-minute XLA:CPU SPMD compile
# on 1-core hosts.  Run from the repo root after any change to the
# train step, mesh layout, or dryrun config.
set -e
cd "$(dirname "$0")/.."
for n in 8 4 16; do
  echo "=== warming dryrun_multichip($n) ==="
  XLA_FLAGS=--xla_force_host_platform_device_count=$n JAX_PLATFORMS=cpu \
    timeout 590 python -c "import __graft_entry__; __graft_entry__.dryrun_multichip($n)"
done
