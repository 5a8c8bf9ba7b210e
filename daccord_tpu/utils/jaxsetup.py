"""JAX runtime setup: persistent compilation cache (one-time compiles).

The cache is enabled only for the TPU/axon backend and scoped per platform:
CPU executables must not be shared across machines (XLA:CPU AOT results embed
the compile machine's vector-ISA features; loading entries compiled elsewhere
— e.g. by a remote-compile service — aborts with feature mismatches).
"""

from __future__ import annotations

import os

_done = False


def setup_compilation_cache(path: str = None) -> None:
    global _done
    if _done:
        return
    _done = True
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        return
    if backend == "cpu":
        return  # CPU compiles are fast; cross-machine AOT reuse is unsafe

    cache = path or os.environ.get(
        "DACCORD_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     f"daccord_tpu_xla_{backend}"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization only
