"""The `--fast` serving preset — single source of truth.

Every surface that exposes --fast (cli.serve, cli.train_rl rollouts,
eval.nss1k, bench.py's dual-headline second program) reads these
constants, so the preset is decided in exactly one place.

Current preset (decided on-chip, PERF.md rounds 4-5):
  DPM-Solver++(2M) 20 steps + CFG guidance interval + text-encoder cache
  every 2nd step. int8 is NOT included — measured as a throughput LOSS at
  512² (PERF.md round 4: -4.9% b=8, -3.2% b=1).

The preset was decided by the round-5 structured-weights re-gate (300
on-chip training iters off random init; perf_data/sweep_r5_struct{,2,3}
.jsonl). Two findings drive it:
  1. The guidance-interval choice must survive real weights: the
     round-4 mid-cut (0.1, 0.85) measured 32.1 dB PSNR-vs-exact with
     random weights but degraded to 27.8 dB structured, while the
     tail-cut (0.0, 0.75) is weight-INSENSITIVE (36.1 dB random AND
     structured).
  2. Under the tail-cut, the aggressive dpm-15 point passes the gate it
     failed under the mid-cut: fastq15 = dpm-15 + (0,0.75) + enc2
     measures 4.144 img/s/chip at 35.4 dB structured (vs dpm-20's
     3.251 at 36.1) — +27% speed for 0.7 dB.
"""
from __future__ import annotations

FAST_SAMPLER = "dpm"
FAST_STEPS = 15
FAST_CFG_INTERVAL = (0.0, 0.75)
FAST_CACHE_ENCODER = 2


def fast_cfg_interval_str() -> str:
    return f"{FAST_CFG_INTERVAL[0]},{FAST_CFG_INTERVAL[1]}"


def apply_fast_preset(args):
    """Expand --fast onto an argparse namespace, leaving any explicitly
    passed --sampler/--steps/--cfg_interval/--cache_encoder untouched
    (argparse defaults are plms/None/None/0, so a non-default value means
    the user chose it)."""
    if args.sampler == "plms":
        args.sampler = FAST_SAMPLER
        if args.steps is None:
            args.steps = FAST_STEPS
    if args.cfg_interval is None:
        args.cfg_interval = fast_cfg_interval_str()
    if args.cache_encoder == 0:
        args.cache_encoder = FAST_CACHE_ENCODER
    return args
