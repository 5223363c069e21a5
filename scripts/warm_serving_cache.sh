#!/bin/bash
# Pre-warm the SERVING program family before production traffic or a
# bench run, by running one real inference pass per mode over the
# target dataset (scripts/run_quality.py — exactly the production code
# path: infer/predict.py, infer/device_pipeline.py).  There is no
# separate AOT entry point: program shapes depend on dataset-wide
# window caps (device_pipeline.py::_dataset_window_caps), so the
# dataset itself is the shape oracle and the warm run doubles as a
# quality check of the deployed (checkpoint, mode) pair.
#
# WHAT THE WARM BUYS depends on the backend (measured, docs/PERF.md
# "Round 5 correction"):
#  * On a TPU host with a local compiler, the persistent compilation
#    cache (.jax_cache) is content-keyed and carries executables
#    across processes — this script makes every later process serve
#    warm.
#  * Through the axon remote-TPU relay, the plugin defers the real
#    XLA compile to first execution server-side; cache entries do NOT
#    carry it, and each PROCESS pays the compile once (int8 B=1024
#    flagship set: ~20-28 min measured round 5).  There, warm the
#    SERVING PROCESS itself: the serving entry points cache run dirs,
#    restored checkpoints and compiled programs in-process
#    (infer/predict.py _RUN_CACHE/_serving_jit), so a long-lived
#    server pays the compile exactly once — run its first pass before
#    admitting traffic.
#
# Usage: scripts/warm_serving_cache.sh <run_dir> [data_path]
# Warms the bench/production mode set: device-sparse int8 (B=1024,
# the headline operating point), device-sparse bf16, host-sparse bf16,
# and host-dense bf16 (B=256 each).
set -e
cd "$(dirname "$0")/.."
RUN=${1:?usage: warm_serving_cache.sh <run_dir> [data_path]}
DATA=${2:-data/synth_pcpnet}
python scripts/run_quality.py "$RUN" --data "$DATA" \
  --extraction device --mode sparse --dtype int8 --batch 1024 \
  --results_name warm_int8
python scripts/run_quality.py "$RUN" --data "$DATA" \
  --extraction device --mode sparse --dtype bfloat16 \
  --results_name warm_bf16
python scripts/run_quality.py "$RUN" --data "$DATA" \
  --mode sparse --dtype bfloat16 --results_name warm_host_sparse
python scripts/run_quality.py "$RUN" --data "$DATA" \
  --mode dense --dtype bfloat16 --results_name warm_host_dense
