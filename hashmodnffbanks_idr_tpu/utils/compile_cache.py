"""Persistent XLA compilation cache.

The train step is a large program (sphere tracer while-loops + second-order
eikonal AD through two NFFB encoders); first compiles are expensive —
especially via this environment's remote-compile tunnel.  A persistent cache
makes every process after the first start instantly.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "HMNFFB_COMPILE_CACHE", os.path.expanduser("~/.cache/hmnffb_xla_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
