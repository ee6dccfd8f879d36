"""Run the remaining on-chip measurement queue sequentially (one TPU job at
a time, no timeouts — axon lease etiquette). Everything appends to
/tmp/onchip_results_r3.log; sweep JSON lines land there too.

Round-4 state: the serving/latency A/Bs this queue originally held were
measured by scripts/sweep_r4.py (PERF.md round-4 table). STEPS below is
the remainder: dual-headline bench validation, accum-train A/B, and a
fresh exact-path trace. Budget ~10 min lease-release lag between steps
(each step is its own chip process; tpu-bench-traps).

Aborts the remaining queue if a step fails with the pool-outage signature
(UNAVAILABLE) so we do not burn a 25-min claim hang per remaining step.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

LOG = "/tmp/onchip_results_r3.log"

STEPS = [
    # NOTE (round 4, 2026-08-19): the round-3 serving/latency queue was
    # executed by scripts/sweep_r4.py (one-process sweep; results in
    # perf_data/sweep_r4_onchip.jsonl + PERF.md round-4 table), and the
    # int8 trace was mooted by int8 losing everywhere and being retired
    # from the presets. What remains, highest-value first:
    #  * the dual-headline bench the driver runs at round end (exact +
    #    fast preset + live PSNR gate in one process) — validate it on
    #    chip BEFORE the driver does;
    #  * accum-train A/B (never measured on chip);
    #  * fresh traces of BOTH current programs (exact + fast preset) to
    #    aim round-5 kernel work — one dual-mode chip process.
    ("bench_dual", [sys.executable, "bench.py"]),
    ("bench_train_accum2", [sys.executable, "scripts/bench_train.py",
                            "--batch", "8", "--mixed_precision",
                            "--accum", "2"]),
    ("bench_train_accum4", [sys.executable, "scripts/bench_train.py",
                            "--batch", "8", "--mixed_precision",
                            "--accum", "4"]),
    # dual-trace: one chip process captures BOTH program traces
    # (exact + fast preset) for round-5 aiming
    ("bench_trace", [sys.executable, "bench.py",
                     "--trace", "/tmp/trace_r4"]),
    ("analyze_trace_exact", [sys.executable, "scripts/analyze_trace.py",
                             "/tmp/trace_r4/exact"]),
    ("analyze_trace_fast", [sys.executable, "scripts/analyze_trace.py",
                            "/tmp/trace_r4/fast"]),
]


def main():
    only = set(sys.argv[1:])
    with open(LOG, "a") as log:
        for name, cmd in STEPS:
            if only and name not in only:
                continue
            stamp = time.strftime("%H:%M:%S")
            # analyze steps consume a trace dir a prior (exception-guarded)
            # bench step may not have produced — skip with a clear message
            # instead of a confusing analyze error (ADVICE r4)
            if name.startswith("analyze_trace") and not os.path.isdir(cmd[-1]):
                print(f"[{stamp}] -- {name}: SKIPPED (trace dir {cmd[-1]} "
                      "missing — upstream bench step did not produce it)",
                      flush=True)
                log.write(f"[{stamp}] {name}: skipped, {cmd[-1]} missing\n")
                continue
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
