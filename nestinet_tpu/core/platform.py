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


def host_fingerprint() -> str:
    """A stable fingerprint of this host's CPU (machine arch + model
    name + ISA flags from /proc/cpuinfo).

    XLA:CPU compilation-cache entries are AOT machine code specialized
    to the COMPILING host's CPU — including LLVM tuning features picked
    from the CPU *model*, not just the ISA flags — so an entry produced
    on one host and loaded on another logs 'could lead to execution
    errors such as SIGILL' (cpu_aot_loader.cc) and may misexecute.
    Every CPU-backend compile cache in this repo is therefore keyed by
    this fingerprint (`cpu_cache_dir`)."""
    import platform as _pf

    feat = _pf.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    feat += " ".join(sorted(line.split(":", 1)[1].split()))
                    if line.startswith(("flags", "Features")):
                        break
    except OSError:
        pass
    return feat


def cpu_cache_dir(cache_root: str) -> str:
    """The host-keyed XLA:CPU compile-cache directory under
    `cache_root`, with a HOSTKEY marker recording the raw fingerprint.

    If the directory exists but its marker mismatches the current host
    (hash collision, or entries copied in from elsewhere), the contents
    are purged — a cold recompile is always safe; loading foreign CPU
    AOT code is not."""
    import hashlib
    import shutil

    feat = host_fingerprint()
    d = os.path.join(
        cache_root, "cpu-" + hashlib.sha1(feat.encode()).hexdigest()[:12]
    )
    marker = os.path.join(d, "HOSTKEY")
    try:
        if os.path.isdir(d):
            recorded = None
            if os.path.exists(marker):
                with open(marker) as f:
                    recorded = f.read()
            if recorded != feat:
                if any(n != "HOSTKEY" for n in os.listdir(d)):
                    shutil.rmtree(d)
                os.makedirs(d, exist_ok=True)
                with open(marker, "w") as f:
                    f.write(feat)
        else:
            os.makedirs(d, exist_ok=True)
            with open(marker, "w") as f:
                f.write(feat)
    except OSError:
        pass  # unwritable cache root: jax will just run uncached
    return d


def configure_compile_cache(cache_root: str, *, backend: str | None = None) -> str:
    """Point JAX's persistent compile cache at `cache_root`, host-keyed
    when the backend is (or will be) XLA:CPU.

    `backend=None` resolves the default backend (initializing it if
    needed).  TPU executables are chip-specific, not host-CPU-specific,
    so they share the plain root across hosts; CPU entries go to the
    per-host subdirectory (see `host_fingerprint`).  Returns the chosen
    directory."""
    import jax

    if backend is None:
        backend = jax.default_backend()
    d = cpu_cache_dir(cache_root) if backend == "cpu" else cache_root
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags: proceed uncached
    return d
