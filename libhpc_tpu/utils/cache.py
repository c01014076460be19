"""Persistent XLA compilation cache setup.

Compiles through the axon remote relay cost 10-150 s per kernel; the
persistent cache makes them one-time. Call early (before first jit)."""

import os

import jax


def enable_compilation_cache(path: str | None = None) -> None:
    path = path or os.environ.get("LIBHPC_JAX_CACHE",
                                  os.path.expanduser("~/.libhpc_jax_cache"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax: silently skip
