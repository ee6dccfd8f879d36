"""Shortened round-3c on-chip queue: waits for any in-flight bench to exit,
then runs the highest-value A/B variants sequentially with incremental
logging to /tmp/r3c_results.log (one JSON line per variant).

Picked over the full sweep_r3b because each cold bench is ~7-8 min through
the remote compiler and the session budget fits only a few runs:
  minkv  — exact; candidate new default (text cross-attn via flash kernel)
  dpm20  — the few-step serving number (separate PERF line)
  b16    — exact; candidate new headline batch
  lat/lat_int8 — batch-1 latency A/B (weight-bound hypothesis)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

LOG = "/tmp/r3c_results.log"

VARIANTS = [
    ("minkv", {"LLT2I_FLASH_MIN_KV": "16"}, []),
    ("dpm20", {}, ["--sampler", "dpm", "--steps", "20"]),
    ("b16", {}, ["--batch", "16", "--vae_chunk", "8"]),
    ("lat", {}, ["--latency"]),
    ("lat_int8", {}, ["--latency", "--int8"]),
]


def wait_for_pid(pid: int) -> None:
    while os.path.exists(f"/proc/{pid}"):
        time.sleep(5)


def main():
    if len(sys.argv) > 1 and sys.argv[1].startswith("--wait="):
        wait_for_pid(int(sys.argv[1].split("=")[1]))
        names = set(sys.argv[2:])
    else:
        names = set(sys.argv[1:])
    with open(LOG, "a") as log:
        for name, env, extra in VARIANTS:
            if names and name not in names:
                continue
            e = dict(os.environ)
            e.update(env)
            t0 = time.time()
            log.write(f"== {name} start {time.strftime('%H:%M:%S')}\n")
            log.flush()
            p = subprocess.run([sys.executable, "bench.py", *extra], env=e,
                               stdout=subprocess.PIPE,
                               stderr=subprocess.STDOUT, text=True)
            line = next((l for l in p.stdout.splitlines()
                         if l.startswith("{")), None)
            dt = time.time() - t0
            if line is None:
                log.write(f"== {name} FAILED ({dt:.0f}s)\n")
                log.write(p.stdout[-1500:] + "\n")
            else:
                rec = json.loads(line)
                rec["variant"] = name
                rec["secs"] = round(dt)
                log.write(json.dumps(rec) + "\n")
            log.flush()
            if p.returncode != 0 and "UNAVAILABLE" in p.stdout:
                log.write("ABORT: pool UNAVAILABLE\n")
                break
    print("done")


if __name__ == "__main__":
    main()
