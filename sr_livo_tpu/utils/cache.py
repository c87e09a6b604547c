"""Persistent XLA compilation cache (first compiles on the TPU tunnel can
take minutes; the cache makes subsequent processes near-instant)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None):
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.jax_cache"))
    os.makedirs(path, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
