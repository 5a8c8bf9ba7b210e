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

    # default to the REPO-LOCAL cache that ships with the checkout (one
    # shared pool for bench, tools and scripts — a per-user ~/.cache
    # default silently recompiled the whole variant space the first time
    # any non-bench entry point ran); fall back to ~/.cache when the
    # checkout isn't writable (site-installed package)
    repo_cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".bench_cache", "xla")
    cache = path or os.environ.get("DACCORD_JAX_CACHE", repo_cache)
    if not os.access(os.path.dirname(os.path.dirname(cache)), os.W_OK):
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             f"daccord_tpu_xla_{backend}")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization only
