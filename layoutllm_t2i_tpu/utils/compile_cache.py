"""Persistent XLA compilation cache (kills the 26-27 min cold start on
repeated bench/serve/driver runs).

History: disabled by default through round 4 because "the axon
remote-compile plugin stalls when the persistent cache tries to serialize
its executables". Round 5 isolated that stall with an on-chip probe
(scripts/probe_compile_cache.py, perf_data/compile_cache_probe.json):

- executable serialize / persistent-cache WRITE: works (P2/P4);
- persistent-cache cross-process HIT: works (R1: 0.35 s vs 0.77 s cold
  for the probe program — the plugin's staged "axon format" cache entry
  loads without a remote compile);
- what stalls is only the raw jax.experimental.serialize_executable
  payload reloaded via deserialize_and_load in a FRESH process (R2) —
  i.e. the manual AOT-reload path, which the persistent cache does not
  use from Python.

So the cache is now ON by default. Opt out with LLT2I_COMPILE_CACHE=""
(empty) or point LLT2I_COMPILE_CACHE=<dir> somewhere else.
"""
from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/llt2i_xla_cache"


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Enable the JAX persistent compilation cache. Returns the cache dir
    (or None when explicitly disabled via LLT2I_COMPILE_CACHE="")."""
    import jax

    if path is None:
        path = os.environ.get("LLT2I_COMPILE_CACHE", DEFAULT_DIR)
    if not path:
        return None
    path = os.path.abspath(path)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path
