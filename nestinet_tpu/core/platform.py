"""Backend/platform selection.

This machine's sitecustomize registers the axon TPU plugin at
interpreter start and pins the platform, so the JAX_PLATFORMS
environment variable alone does not take effect; the config update
below is the authoritative override.  CLIs call this before their
first backend touch so `JAX_PLATFORMS=cpu` (e.g. with
`--xla_force_host_platform_device_count=8` for a virtual mesh) works
as users expect.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backends already initialized; env took effect or it's too late
