"""Persistent XLA compilation cache (big wins for the 50-step sampler program
on repeated bench/driver runs)."""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "LLT2I_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
    )
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
