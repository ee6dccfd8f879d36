"""Round-5 on-chip measurement queue (VERDICT r4 items 1, 2, 3, 4, 6).

One chip process at a time, sequential, no timeouts (axon lease
etiquette); everything appends to /tmp/onchip_r5.log. Steps, value-first:

  bench_dual_cold   driver bench (dual headline) with the persistent
                    compile cache ON — cold run writes the cache
  bench_dual_warm   identical re-run — its wall-clock IS the warm full-
                    bench cost (VERDICT item 2 proof at SD scale)
  train_struct      300 SD-scale synthetic iters, --trainable_mode all,
                    reference .pth export -> the structured checkpoint
  sweep_struct      PSNR-vs-exact quality table re-scored with the
                    structured weights (VERDICT item 3 / weak #3)
  rl_onchip         cli.train_rl at SD geometry, offline cached-LLM,
                    --fast rollouts, 2 epochs (VERDICT item 1)
  nss1k_exact       full 943-prompt COCO-NSS1K gate, GT layouts, exact
                    PLMS-50 (VERDICT item 4) — wall-clock + per-split rows
  nss1k_fast        same under the --fast preset
  sweep_b1216       b=12/16 remote-compile retry with harder VAE chunking
                    (VERDICT item 6)

Run:  python scripts/run_r5_queue.py [step ...]
Aborts the remaining queue on the pool-outage signature (UNAVAILABLE).
Prereq fixtures: /tmp/rl_sd (scripts in git log r5 built it: 8 examples,
512x512 images, layout cache).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

LOG = "/tmp/onchip_r5.log"
PY = sys.executable


def _struct_ckpt():
    """Newest exported .pth from the train_struct run (the trainer
    auto-resumes into a fresh tagNN each launch)."""
    import glob

    paths = sorted(glob.glob("/tmp/OUT_r5/struct_r5/tag*/checkpoint_*.pth"),
                   key=os.path.getmtime)
    return paths[-1] if paths else ""


STRUCT_CKPT = _struct_ckpt() or "/tmp/OUT_r5/struct_r5/tag00/checkpoint_00000300.pth"

STEPS = [
    ("bench_dual_cold", [PY, "bench.py"], {}),
    ("bench_dual_warm", [PY, "bench.py"], {}),
    # --optimizer sgd: AdamW moments for the full-finetune mode OOM a 16 GB
    # chip (measured RESOURCE_EXHAUSTED, /tmp/onchip_r5.log 09:57); sgd
    # keeps zero opt state and still moves every weight off random init,
    # which is all the structured-weights re-gate needs
    ("train_struct", [PY, "-m", "layoutllm_t2i_tpu.cli.train_diffusion",
                      "--name", "struct_r5", "--output_root", "/tmp/OUT_r5",
                      "--synthetic", "--batch_size", "4",
                      "--total_iters", "300", "--save_every_iters", "300",
                      "--warmup_steps", "20", "--trainable_mode", "all",
                      "--optimizer", "sgd", "--base_learning_rate", "5e-4",
                      "--mixed_precision", "--export_reference_ckpt"], {}),
    ("sweep_struct", [PY, "scripts/sweep_r4.py", "base", "dpm20", "cfgmid",
                      "enc2", "fast2", "fast15"],
     {"LLT2I_SWEEP_CKPT": STRUCT_CKPT,
      "LLT2I_SWEEP_OUT": "/tmp/sweep_r5_struct.jsonl"}),
    ("rl_onchip", [PY, "-m", "layoutllm_t2i_tpu.cli.train_rl",
                   "--img_dir", "/tmp/rl_sd/imgs",
                   "--sampled_data_dir", "/tmp/rl_sd",
                   "--train_number", "8", "--cand_number", "8",
                   "--layout_cache", "/tmp/rl_sd/layout_cache.json",
                   "--epochs", "2", "--batch_size", "4", "--fast",
                   "--ckpt_root", "/tmp/rl_sd/ckpt", "--exp", "onchip"], {}),
    # second structured-weights pass: sweep_struct showed fast2 degrades
    # 32.1 -> 27.8 dB with non-random weights (cfg-interval is the mover);
    # fastq (tail-cut CFG 0,0.75) and cfg75 alone measured 36.1 / 53.9 dB
    # under random weights — re-gate them structured before re-deciding
    # the --fast preset
    ("sweep_struct2", [PY, "scripts/sweep_r4.py", "base", "fastq", "cfg75"],
     {"LLT2I_SWEEP_CKPT": STRUCT_CKPT,
      "LLT2I_SWEEP_OUT": "/tmp/sweep_r5_struct2.jsonl"}),
    ("nss1k_exact", [PY, "-m", "layoutllm_t2i_tpu.eval.nss1k",
                     "--data_dir", "/root/reference/data",
                     "--batch_size", "8"], {}),
    ("nss1k_fast", [PY, "-m", "layoutllm_t2i_tpu.eval.nss1k",
                    "--data_dir", "/root/reference/data",
                    "--batch_size", "8", "--fast"], {}),
    ("sweep_b1216", [PY, "scripts/sweep_r4.py", "b12", "b16"],
     {"LLT2I_SWEEP_OUT": "/tmp/sweep_r5_b1216.jsonl",
      "LLT2I_SWEEP_VAE_CHUNK": "2"}),
    # VERDICT item 6 second half: name where the b=1 program's 28.9% MFU
    # goes — capture its device trace for analyze_trace.py
    ("bench_b1_trace", [PY, "bench.py", "--latency",
                        "--trace", "/tmp/trace_b1"], {}),
]


def main():
    only = set(sys.argv[1:])
    with open(LOG, "a") as log:
        for name, cmd, extra_env in STEPS:
            if only and name not in only:
                continue
            if name == "sweep_struct" and not os.path.exists(STRUCT_CKPT):
                print(f"-- {name}: SKIPPED ({STRUCT_CKPT} missing — "
                      "train_struct did not produce it)", flush=True)
                log.write(f"{name}: skipped, ckpt missing\n")
                continue
            stamp = time.strftime("%H:%M:%S")
            print(f"[{stamp}] == {name}: {' '.join(cmd)}", flush=True)
            log.write(f"\n[{stamp}] == {name}: {' '.join(cmd)}\n")
            log.flush()
            t0 = time.time()
            p = subprocess.run(cmd, stdout=subprocess.PIPE,
                               stderr=subprocess.STDOUT, text=True,
                               env={**os.environ, **extra_env})
            log.write(p.stdout)
            log.write(f"[exit {p.returncode} after {time.time()-t0:.0f}s]\n")
            log.flush()
            tail = "\n".join(p.stdout.splitlines()[-4:])
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
