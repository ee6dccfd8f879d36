"""Persistent XLA compilation cache (big wins for the 50-step sampler program
on repeated bench/driver runs)."""
from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    """Opt-in via LLT2I_COMPILE_CACHE=<dir>. Disabled by default: the axon
    remote-compile TPU plugin stalls when the persistent cache tries to
    serialize its executables."""
    import jax

    path = path or os.environ.get("LLT2I_COMPILE_CACHE")
    if not path:
        return
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
