"""End-to-end A/B sweep of the round-3b opt-in knobs over bench.py.

Each variant runs the FULL headline bench (PLMS-50, CFG, VAE decode) in a
fresh subprocess so env-var knobs re-trace cleanly. Variants:

  base        — committed defaults (the BENCH_r03 configuration)
  minkv       — LLT2I_FLASH_MIN_KV=16: text cross-attention (M=77) through
                the flash kernel instead of XLA's materialized softmax
  minkv+grow  — + LLT2I_FLASH_MONO_GROW=1: grow the whole-row q block on
                small-KV sites
  scoped32    — --xla_tpu_scoped_vmem_limit_kib=32768 with raised kernel
                budgets (mono bq=512 at the 64^2 self-attn site, bigger FFN
                blocks at the K=1280 sites)

Run on the real chip from the repo root:  python scripts/sweep_r3b.py
TPU etiquette: one variant at a time, no `timeout` wrapper (killed TPU
processes wedge the chip lease; see .claude/skills/verify).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

VARIANTS = [
    ("base", {}),
    # minkv / minkv+grow: RETIRED — measured 2.5% slower at UNet-forward
    # level (sweep_flash kN suffix, PERF.md round-3c); kept runnable for
    # re-checks but excluded from the default full-bench queue by cost.
    ("minkv", {"LLT2I_FLASH_MIN_KV": "16"}),
    ("minkv+grow", {"LLT2I_FLASH_MIN_KV": "16", "LLT2I_FLASH_MONO_GROW": "1"}),
    ("scoped32", {
        "XLA_FLAGS": "--xla_tpu_scoped_vmem_limit_kib=32768",
        "LLT2I_FLASH_WHOLEROW_MB": "12",
        "LLT2I_FLASH_FULLKV_MB": "8",
        "LLT2I_FFN_BN": "256",
        "LLT2I_FFN_BM": "1024",
    }),
    # batch scaling: larger CFG batches amortize kernel grid / dispatch
    # overheads; headline stays per-chip img/s so bigger b is a legitimate
    # throughput configuration if it wins (and VMEM still fits)
    ("b12", {"LLT2I_BENCH_ARGS": "--batch 12 --vae_chunk 6"}),
    ("b16", {"LLT2I_BENCH_ARGS": "--batch 16 --vae_chunk 8"}),
    # encoder propagation (APPROXIMATE — separate PERF.md line, never the
    # headline default; arXiv:2312.09608): encoder every 2nd / 3rd step
    ("enc2", {"LLT2I_BENCH_ARGS": "--cache_encoder 2"}),
    ("enc3", {"LLT2I_BENCH_ARGS": "--cache_encoder 3"}),
    # guidance interval (EXACT flop cut, arXiv:2404.07724). cfgmid is the
    # paper-faithful anchoring (CFG OFF at the highest noise levels — that's
    # where the FID gain comes from — and at the tail); cfg75 is the pure
    # tail-cut throughput variant (bigger saving, quality claim does NOT
    # carry over — gate it on eval/nss1k before shipping as a default)
    ("cfgmid", {"LLT2I_BENCH_ARGS": "--cfg_interval 0.1,0.85"}),
    ("cfg75", {"LLT2I_BENCH_ARGS": "--cfg_interval 0.0,0.75"}),
    # DPM-Solver++(2M) few-step serving config (PLMS-50-class quality at
    # 20 steps per arXiv:2211.01095; separate PERF line, not headline)
    ("dpm20", {"LLT2I_BENCH_ARGS": "--sampler dpm --steps 20"}),
]


def main():
    only = set(sys.argv[1:])
    results = {}
    for name, env in VARIANTS:
        if only and name not in only:
            continue
        e = dict(os.environ)
        e.update(env)
        extra = e.pop("LLT2I_BENCH_ARGS", "").split()
        print(f"== {name}: {env}", flush=True)
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
        val = json.loads(line)["value"]
        results[name] = val
        print(f"   {val:.4f} img/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
