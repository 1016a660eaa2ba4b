"""Environment setup helpers (compilation cache, platform forcing)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled executables to disk so repeat runs skip XLA compiles
    (this matters doubly on remote-compile TPU frontends where each compile
    is an RPC; safe no-op if unsupported)."""
    import jax

    path = path or os.environ.get(
        "SVT_COMPILE_CACHE", os.path.expanduser("~/.cache/svt_jax_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def force_cpu(devices: int = 8) -> None:
    """Force the CPU backend with N virtual devices. Must run before the
    first backend use; needed on images whose sitecustomize pins
    JAX_PLATFORMS to a TPU plugin."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
