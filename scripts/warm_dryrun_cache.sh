#!/bin/bash
# Warm the host-keyed XLA:CPU compilation cache for the multi-chip
# dryrun.  NOTE: entries are host-CPU-keyed (core/platform.py), so this
# only warms re-runs ON THE SAME HOST; a different driver host compiles
# cold — measured 670 s for the full dryrun incl. the flagship-depth
# SPMD certification (acceptable; certification runs last so earlier
# evidence lands even under a tight budget).  Run from the repo root
# after any change to the train step, mesh layout, or dryrun config.
set -e
cd "$(dirname "$0")/.."
for n in 8 4 16; do
  echo "=== warming dryrun_multichip($n) ==="
  XLA_FLAGS=--xla_force_host_platform_device_count=$n JAX_PLATFORMS=cpu \
    timeout 590 python -c "import __graft_entry__; __graft_entry__.dryrun_multichip($n)"
done
