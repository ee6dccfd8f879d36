"""On-chip A/B of the batch-1 LATENCY knobs over `bench.py --latency`.

Decides whether latency mode is weight-bound (the int8 premise, PERF.md
"Weight-only int8"): if the b=1 step time is close to the b=8 step time,
weights/overheads dominate and int8 should pay; if it is ~1/8, the step is
compute-bound and int8 is only a footprint win. Variants:

  fp            — committed defaults (bf16 weights)
  int8          — --int8: weight-only int8, XLA dots with fused dequant
                  (the Pallas FFN kernel auto-disengages; ops/quant.py)
  int8+ffnq     — + LLT2I_FFN_INT8=1: int8-aware fused FFN kernel
                  (in-VMEM dequant, ops/pallas/ffn.py) — first on-chip run
                  of that kernel, so watch for Mosaic rejections
  int8-tput     — throughput sanity at the default batch (int8 should be
                  ~neutral at b=8 where activations dominate)

Run on the real chip from the repo root:  python scripts/sweep_latency.py
TPU etiquette: one variant at a time, no `timeout` wrapper (killed TPU
processes wedge the chip lease; see .claude/skills/verify).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

VARIANTS = [
    ("fp", {}, ["--latency"]),
    ("int8", {}, ["--latency", "--int8"]),
    ("int8+ffnq", {"LLT2I_FFN_INT8": "1"}, ["--latency", "--int8"]),
    ("int8-tput", {}, ["--int8"]),
]


def main():
    only = set(sys.argv[1:])
    results = {}
    for name, env, extra in VARIANTS:
        if only and name not in only:
            continue
        e = dict(os.environ)
        e.update(env)
        print(f"== {name}: {env} bench.py {' '.join(extra)}", flush=True)
        proc = subprocess.run(
            [sys.executable, "bench.py", *extra], env=e,
            capture_output=True, text=True)
        line = next((l for l in proc.stdout.splitlines()
                     if l.startswith("{")), None)
        if line is None:
            print(f"   FAILED\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}",
                  flush=True)
            results[name] = None
            continue
        rec = json.loads(line)
        results[name] = rec["value"]
        print(f"   {rec['value']:.4f} {rec['unit']}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
