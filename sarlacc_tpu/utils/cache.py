"""Persistent XLA compilation cache setup.

Remote-TPU compiles through the axon tunnel cost ~0.5-10 s per program and
the axon sitecustomize imports jax at interpreter start, BEFORE user code
can export ``JAX_COMPILATION_CACHE_DIR`` — so the env-var route silently
does nothing (r2's bench spent ~700 s recompiling every run).  The config
API takes effect at runtime; call this before the first jit.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]

DEFAULT_DIR = "/root/repo/.jax_cache"


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax at an on-disk compilation cache (cross-process hits are
    ~10 ms vs ~0.5-10 s remote compiles).  Returns the cache dir."""
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
