"""JAX runtime setup: persistent compilation cache (one-time compiles)."""

from __future__ import annotations

import os

_done = False


def setup_compilation_cache(path: str = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    cache = path or os.environ.get(
        "DACCORD_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "daccord_tpu_xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization only
