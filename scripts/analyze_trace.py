"""Aggregate a jax.profiler trace's XLA-Ops durations into PERF.md buckets.

Usage: python scripts/analyze_trace.py /tmp/llt2i_trace [--top 30]
Finds the newest plugins/profile/*/*.trace.json.gz under the logdir,
sums device-op durations by bucket (pallas kernels, convs, copies, fusions)
and prints the table the PERF.md breakdowns are built from.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict


def bucket_of(name: str) -> str:
    n = name.lower()
    if "_flash" in n or "flash_kernel" in n:
        return "flash attention kernels"
    if "_ffn" in n or "ffn_ln" in n or "ffn_call" in n:
        return "pallas ffn kernels"
    if "_gn_" in n or "_ln_" in n or "gn_pallas" in n or "ln_pallas" in n:
        return "pallas norms"
    if "custom-call" in n or "tpu_custom_call" in n:
        return "other custom calls"
    if "convolution" in n or n.startswith("conv"):
        return "convolutions"
    if n.startswith("copy") or ".copy" in n or n.startswith("transpose"):
        return "layout copies/transposes"
    if n.startswith("convert") or ".convert" in n:
        # standalone dtype converts: in an --int8 trace a LARGE entry here
        # means XLA materialized the dequantized weights in HBM instead of
        # fusing the dequant into the consuming dot — the int8 path's
        # failure mode (ops/quant.py)
        return "standalone converts (int8 dequant?)"
    if n.startswith("dot") or "dot_general" in n:
        return "dots (unfused)"
    if "dynamic-update-slice" in n or "dynamic-slice" in n:
        return "dynamic slices"
    if "fusion" in n:
        return "fusions (elementwise/matmul)"
    if "reduce" in n:
        return "reductions"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    paths = sorted(glob.glob(os.path.join(
        args.logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert paths, f"no trace under {args.logdir}"
    path = paths[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data["traceEvents"]

    # tid of the 'XLA Ops' thread on the TPU device process
    ops_tids = set()
    for e in ev:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("args", {}).get("name") == "XLA Ops"):
            ops_tids.add((e["pid"], e["tid"]))

    # SELF time per op: events on an XLA-Ops tid nest (while/cond parents
    # span their body ops), so raw durations double-count — a while.N
    # parent would swallow 70%+ of the "other" bucket (r5 fix). Walk each
    # tid's events in start order with a stack and charge child durations
    # back to the parent.
    by_tid = defaultdict(list)
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in ops_tids:
            continue
        by_tid[(e["pid"], e["tid"])].append(
            (e.get("ts", 0.0), e.get("dur", 0.0), e.get("name", "?")))

    per_op = defaultdict(float)
    per_bucket = defaultdict(float)
    total = 0.0
    for evs in by_tid.values():
        evs.sort(key=lambda t: (t[0], -t[1]))
        stack = []  # [end_ts, child_dur_accum, name, dur]
        def _pop():
            nonlocal total
            end, child, name, dur = stack.pop()
            self_ms = max(dur - child, 0.0) / 1000.0
            per_op[name] += self_ms
            per_bucket[bucket_of(name)] += self_ms
            total += self_ms
        for ts, dur, name in evs:
            while stack and ts >= stack[-1][0] - 1e-9:
                _pop()
            if stack:
                stack[-1][1] += dur
            stack.append([ts + dur, 0.0, name, dur])
        while stack:
            _pop()

    print(f"trace: {path}\ntotal XLA-Ops device time: {total:.1f} ms\n")
    print("== buckets ==")
    for b, ms in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.2f} ms  {100 * ms / total:5.1f}%  {b}")
    print(f"\n== top {args.top} ops ==")
    for n, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms:9.2f} ms  {n[:110]}")


if __name__ == "__main__":
    main()
