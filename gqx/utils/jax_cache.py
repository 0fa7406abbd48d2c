"""Persistent XLA compilation cache.

First-compile of the fused train step is expensive (minutes on a tunneled
TPU); the persistent cache makes subsequent process launches (CLI runs,
bench.py) near-instant.  Call once before building jitted steps.
"""

from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    path = path or os.environ.get(
        "GQX_JAX_CACHE_DIR", os.path.expanduser("~/.cache/gqx_jax_cache")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _DONE = True
    except Exception:
        pass
