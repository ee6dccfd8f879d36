"""Run the round-3 on-chip measurement queue sequentially (one TPU job at a
time, no timeouts — axon lease etiquette). Everything appends to
/tmp/onchip_results_r3.log; sweep JSON lines land there too.

Queue (see /tmp/onchip_todo.md):
  1. sweep_r3b.py            — all variants: base/minkv/grow/scoped32/b12/
                               b16 + enc2/enc3/cfgmid/cfg75/dpm20
  2. sweep_latency.py        — fp / int8 / int8+ffnq / int8-tput
  3. bench.py --trace        — fresh trace at defaults -> analyze_trace
  4. bench.py --int8 --trace — dequant-fusion check (standalone-convert
                               bucket must stay small)
  5. bench_train.py --accum 2 / 4 (mixed precision, b=8)
  6. bench.py                — final headline confirm

Aborts the remaining queue if a step fails with the pool-outage signature
(UNAVAILABLE) so we do not burn a 25-min claim hang per remaining step.
"""
from __future__ import annotations

import subprocess
import sys
import time

LOG = "/tmp/onchip_results_r3.log"

STEPS = [
    # NOTE (round-3 continuation, 2026-08-19): a full bench.py run costs
    # ~26 min cold through the remote compiler (measured), so the full
    # sweep_r3b list (11 variants) is ~5 h of chip time. Highest-value
    # first; the minkv question was answered cheaper at UNet-forward level
    # (sweep_flash kN suffix — see PERF.md round-3c).
    ("sweep_latency", [sys.executable, "scripts/sweep_latency.py"]),
    ("sweep_r3b_serving", [sys.executable, "scripts/sweep_r3b.py",
                           "dpm20", "cfgmid", "b16"]),
    # explicit names: skips the retired minkv/minkv+grow variants and the
    # three already measured by sweep_r3b_serving (each cold variant is
    # ~26 min of chip — running all 11 would waste ~2 h, ADVICE r3)
    ("sweep_r3b_rest", [sys.executable, "scripts/sweep_r3b.py",
                        "base", "scoped32", "b12", "enc2", "enc3", "cfg75"]),
    ("bench_trace", [sys.executable, "bench.py", "--trace", "/tmp/trace_r3c"]),
    ("analyze_trace", [sys.executable, "scripts/analyze_trace.py",
                       "/tmp/trace_r3c"]),
    ("bench_int8_trace", [sys.executable, "bench.py", "--int8", "--trace",
                          "/tmp/trace_int8"]),
    ("analyze_int8_trace", [sys.executable, "scripts/analyze_trace.py",
                            "/tmp/trace_int8"]),
    ("bench_train_accum2", [sys.executable, "scripts/bench_train.py",
                            "--batch", "8", "--mixed_precision",
                            "--accum", "2"]),
    ("bench_train_accum4", [sys.executable, "scripts/bench_train.py",
                            "--batch", "8", "--mixed_precision",
                            "--accum", "4"]),
    ("bench_final", [sys.executable, "bench.py"]),
]


def main():
    only = set(sys.argv[1:])
    with open(LOG, "a") as log:
        for name, cmd in STEPS:
            if only and name not in only:
                continue
            stamp = time.strftime("%H:%M:%S")
            print(f"[{stamp}] == {name}: {' '.join(cmd)}", flush=True)
            log.write(f"\n[{stamp}] == {name}: {' '.join(cmd)}\n")
            log.flush()
            t0 = time.time()
            p = subprocess.run(cmd, stdout=subprocess.PIPE,
                               stderr=subprocess.STDOUT, text=True)
            log.write(p.stdout)
            log.write(f"[exit {p.returncode} after {time.time()-t0:.0f}s]\n")
            log.flush()
            tail = "\n".join(p.stdout.splitlines()[-3:])
            print(f"   exit {p.returncode} ({time.time()-t0:.0f}s)\n{tail}",
                  flush=True)
            if p.returncode != 0 and "UNAVAILABLE" in p.stdout:
                print("pool went UNAVAILABLE — aborting remaining queue",
                      flush=True)
                log.write("ABORT: pool UNAVAILABLE\n")
                break
    print(f"queue done; full log: {LOG}", flush=True)


if __name__ == "__main__":
    main()
