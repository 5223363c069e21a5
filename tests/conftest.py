"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the TPU answer to "multi-node tests without a cluster": JAX's CPU
backend is split into 8 virtual devices so every sharding / pjit path is
exercised exactly as it would be on an 8-chip slice.
"""

import os

# Must run before jax initializes its backends.  Env vars are NOT enough
# here: the machine's sitecustomize registers the axon TPU plugin at
# interpreter start and pins the platform, so the config update below is
# the authoritative override onto the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax as _jax  # noqa: E402

_jax.config.update("jax_platforms", "cpu")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: the deep 3D-inception stacks take minutes
# to compile on the CPU backend; cache hits make re-runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture
def rng():
    return np.random.RandomState(3627473)
