"""On-chip probe: can the axon remote-compile plugin serialize executables?

VERDICT r4 item 2 (kill the 26-27 min cold-start): utils/compile_cache.py
documents a historical stall when the persistent compilation cache tried to
serialize executables through the axon tunnel. The plugin binary, however,
exports a designed path for exactly this (strings in libaxon_pjrt.so:
"axon_serialize_executable", "SerializedExecutable v", "load_serialized
(staged cache entry)", "PJRT_Executable_DeserializeAndLoad: cached
executable is axon format v..."), so this probe isolates, phase by phase
with a hard per-phase watchdog (a stall prints WHERE and exits rather than
holding the lease forever):

  P1  tiny jit compile + dispatch (baseline: tunnel works)
  P2  jax.experimental.serialize_executable.serialize() on the AOT-compiled
      executable  <- the suspected staller
  P3  deserialize_and_load + run in-process (correctness)
  P4  jax_compilation_cache_dir enabled, compile a second fn, check that
      cache files land on disk
  P5  second compile of the SAME fn in-process after clearing jax caches
      (in-memory hit; cross-process hit is probe step --reload)

Run (one chip process at a time):   python scripts/probe_compile_cache.py
Then the cross-process half:        python scripts/probe_compile_cache.py --reload

--reload expects the first run's artifacts in /tmp/cc_probe and measures
(a) persistent-cache hit compile time for the P4 function and (b)
deserialize_and_load of the P2 payload from disk + a dispatch.
"""
from __future__ import annotations

import json
import os
import pickle
import sys
import threading
import time

OUT = "/tmp/cc_probe"
CACHE = os.path.join(OUT, "xla_cache")
RESULTS = {}

_phase = {"name": "init", "deadline": time.time() + 300}


def _watchdog():
    while True:
        time.sleep(5)
        if time.time() > _phase["deadline"]:
            print(f"[WATCHDOG] phase '{_phase['name']}' exceeded its budget "
                  f"— STALL CONFIRMED HERE; exiting to release the claim",
                  flush=True)
            name = ("result_reload.json" if "--reload" in sys.argv
                    else "result.json")
            with open(os.path.join(OUT, name), "w") as f:
                json.dump({**RESULTS, "stalled_in": _phase["name"]}, f)
            os._exit(42)


def phase(name, budget_s):
    _phase["name"] = name
    _phase["deadline"] = time.time() + budget_s
    print(f"[{time.strftime('%H:%M:%S')}] phase {name} (budget {budget_s}s)",
          flush=True)


def main():
    os.makedirs(OUT, exist_ok=True)
    os.makedirs(CACHE, exist_ok=True)
    threading.Thread(target=_watchdog, daemon=True).start()
    reload_mode = "--reload" in sys.argv

    phase("import+devices", 600)  # first claim can block ~10 min on lease lag
    import numpy as np

    import jax
    import jax.numpy as jnp

    if reload_mode:
        # enable the cache BEFORE any compile so P4's entry can hit
        jax.config.update("jax_compilation_cache_dir", CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    dev = jax.devices()[0]
    print("devices:", jax.devices(), flush=True)
    RESULTS["device"] = str(dev)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((256, 256),
                                                             dtype=np.float32))

    def f(a):
        return jnp.tanh(a @ a) * 2.0

    def g(a):
        return jnp.sin(a @ a.T) + 1.0

    if not reload_mode:
        phase("P1_baseline_compile", 600)
        t0 = time.time()
        lowered = jax.jit(f).lower(x)
        compiled = lowered.compile()
        RESULTS["p1_compile_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        y = compiled(x)
        RESULTS["p1_first_dispatch_ok"] = bool(np.isfinite(
            float(np.asarray(y)[0, 0])))
        print("P1 ok:", RESULTS, flush=True)

        phase("P2_serialize", 300)
        from jax.experimental.serialize_executable import serialize

        t0 = time.time()
        payload, in_tree, out_tree = serialize(compiled)
        RESULTS["p2_serialize_s"] = round(time.time() - t0, 2)
        RESULTS["p2_payload_bytes"] = len(payload)
        with open(os.path.join(OUT, "exe.bin"), "wb") as fh:
            pickle.dump((payload, in_tree, out_tree), fh)
        print("P2 ok:", RESULTS["p2_serialize_s"], "s,",
              RESULTS["p2_payload_bytes"], "bytes", flush=True)

        phase("P3_deserialize_and_run", 300)
        from jax.experimental.serialize_executable import deserialize_and_load

        t0 = time.time()
        compiled2 = deserialize_and_load(payload, in_tree, out_tree)
        RESULTS["p3_deserialize_s"] = round(time.time() - t0, 2)
        y2 = compiled2(x)
        RESULTS["p3_match"] = bool(np.allclose(np.asarray(y), np.asarray(y2)))
        print("P3 ok:", RESULTS["p3_deserialize_s"], "s, match",
              RESULTS["p3_match"], flush=True)

        phase("P4_persistent_cache_write", 600)
        jax.config.update("jax_compilation_cache_dir", CACHE)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        t0 = time.time()
        _ = jax.jit(g)(x).block_until_ready()
        RESULTS["p4_compile_s"] = round(time.time() - t0, 2)
        RESULTS["p4_cache_files"] = sorted(os.listdir(CACHE))
        RESULTS["p4_cache_bytes"] = sum(
            os.path.getsize(os.path.join(CACHE, p)) for p in os.listdir(CACHE))
        print("P4 ok:", RESULTS["p4_compile_s"], "s; cache:",
              RESULTS["p4_cache_files"], flush=True)
    else:
        phase("R1_cache_hit_compile", 600)
        t0 = time.time()
        _ = jax.jit(g)(x).block_until_ready()
        RESULTS["r1_cached_compile_s"] = round(time.time() - t0, 2)
        print("R1 (persistent-cache hit) compile+dispatch:",
              RESULTS["r1_cached_compile_s"], "s", flush=True)

        phase("R2_deserialize_from_disk", 300)
        from jax.experimental.serialize_executable import deserialize_and_load

        with open(os.path.join(OUT, "exe.bin"), "rb") as fh:
            payload, in_tree, out_tree = pickle.load(fh)
        t0 = time.time()
        compiled = deserialize_and_load(payload, in_tree, out_tree)
        RESULTS["r2_deserialize_s"] = round(time.time() - t0, 2)
        y = compiled(x)
        RESULTS["r2_finite"] = bool(np.isfinite(float(np.asarray(y)[0, 0])))
        print("R2 (AOT reload) ok:", RESULTS, flush=True)

    phase("write_result", 60)
    name = "result_reload.json" if reload_mode else "result.json"
    with open(os.path.join(OUT, name), "w") as f:
        json.dump(RESULTS, f, indent=1)
    print("DONE", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
