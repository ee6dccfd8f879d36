"""On-chip sweep of flash-attention block sizes for the production UNet.

Times the full UNet forward (b=8, SD-1.4 scale) with the eval loop inside a
single jitted lax.scan: one device dispatch covers --evals UNet evaluations,
so the axon tunnel's ~2s per-dispatch latency doesn't pollute the numbers
(host-side timing of single calls is useless through the tunnel; see PERF.md).

Each (block_q, block_k) variant recompiles (~4-5 min on the remote compiler),
so keep the variant list short and targeted.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--evals", type=int, default=25)
    ap.add_argument("--variants", type=str, default="256x512,512x512,1024x512",
                    help="comma-separated BQxBK list")
    args = ap.parse_args()

    from layoutllm_t2i_tpu.models.unet import UNetConfig, init_unet_params, unet_apply
    from layoutllm_t2i_tpu.utils.trees import materialize_params
    from layoutllm_t2i_tpu.ops import attention as attn_mod

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    cfg = UNetConfig()
    params = materialize_params(init_unet_params, jax.random.PRNGKey(0), cfg, dtype)

    b = args.batch
    g = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(g.standard_normal(s), dtype)
    x0 = mk(b, cfg.image_size, cfg.image_size, 4)
    t = jnp.full((b,), 500, jnp.int32)
    ctx = mk(b, 77, cfg.context_dim)
    boxes = jnp.asarray(np.tile([[0.1, 0.2, 0.6, 0.8]], (b, 30, 1)), jnp.float32)
    masks = jnp.asarray(np.ones((b, 30)), jnp.float32)
    pos = mk(b, 30, cfg.grounding_in_dim)
    rel = mk(b, 10, cfg.context_dim)

    n_evals = args.evals

    def make_loop():
        @jax.jit
        def loop(params, x):
            def body(h, i):
                eps = unet_apply(params, cfg, h, t, ctx, boxes, masks, pos, rel,
                                 fuser_scale=jnp.float32(1.0))
                # keep the carry bounded and data-dependent across evals
                return (h - 0.01 * eps).astype(h.dtype), ()
            out, _ = jax.lax.scan(body, x, jnp.arange(n_evals))
            # scalar result: fetching its VALUE forces real execution
            # (block_until_ready alone can return early through the tunnel)
            return jnp.sum(out.astype(jnp.float32))
        return loop

    results = {}
    # unsuffixed variants reset to the env-derived import-time value, not a
    # hardcoded 128, so an operator-set LLT2I_FLASH_MIN_KV isn't overridden
    min_kv_orig = attn_mod._FLASH_MIN_KV
    for var in args.variants.split(","):
        parts = var.split("x")
        bq, bk = int(parts[0]), int(parts[1])
        # optional extra fields: aN toggles LLT2I_FLASH_ADAPTIVE_K, eN sets
        # LLT2I_FLASH_EXP by index (e0=exp, e1=exp2, e2=bf16 — names would
        # collide with the 'x' separator). Reset both each iteration so a
        # suffixed variant doesn't leak into later ones.
        os.environ["LLT2I_FLASH_ADAPTIVE_K"] = "0"
        os.environ["LLT2I_FLASH_EXP"] = "exp"
        os.environ["LLT2I_FLASH_MONO"] = "1"
        os.environ["LLT2I_PALLAS_FFN"] = "1"
        # _FLASH_MIN_KV is bound at import time — set the module attribute
        # (same pattern as _BLOCK_Q/_BLOCK_K); MONO_GROW is read per call.
        attn_mod._FLASH_MIN_KV = min_kv_orig
        os.environ["LLT2I_FLASH_MONO_GROW"] = "0"
        os.environ["LLT2I_FLASH_HEAD_BLOCK"] = "1"
        os.environ["LLT2I_FLASH_WHOLEROW_MB"] = "6"
        os.environ["LLT2I_FLASH_VMEM_MB"] = "0"
        for extra in parts[2:]:
            if extra.startswith("a"):
                os.environ["LLT2I_FLASH_ADAPTIVE_K"] = extra[1:]
            elif extra.startswith("e"):
                os.environ["LLT2I_FLASH_EXP"] = ("exp", "exp2", "bf16")[int(extra[1:])]
            elif extra.startswith("m"):
                os.environ["LLT2I_FLASH_MONO"] = extra[1:]
            elif extra.startswith("f"):
                os.environ["LLT2I_PALLAS_FFN"] = extra[1:]
            elif extra.startswith("k"):
                # kN -> _FLASH_MIN_KV=N: route small-KV (text cross-attn
                # M=77) sites through the flash kernel instead of XLA softmax
                attn_mod._FLASH_MIN_KV = int(extra[1:])
            elif extra.startswith("g"):
                os.environ["LLT2I_FLASH_MONO_GROW"] = extra[1:]
            elif extra.startswith("h"):
                # hN -> LLT2I_FLASH_HEAD_BLOCK=N: N heads per grid program
                # in the whole-row kernel (grid-level A/B, VERDICT r3 item 6)
                os.environ["LLT2I_FLASH_HEAD_BLOCK"] = extra[1:]
            elif extra.startswith("w"):
                # wN -> LLT2I_FLASH_WHOLEROW_MB=N: raise the score-row VMEM
                # budget so larger q blocks stay on the whole-row path
                # (static jit arg, so each variant retraces)
                os.environ["LLT2I_FLASH_WHOLEROW_MB"] = extra[1:]
            elif extra.startswith("v"):
                # vN -> LLT2I_FLASH_VMEM_MB=N: raise Mosaic's scoped-VMEM
                # ceiling for the kernel (default 16MB; v5e physical 128MB).
                # Required by hN>1 variants — hb x resident K/V + the
                # (hb, BQ, Mp) f32 score block OOM the default (measured
                # 16.27MB for h2/w12 on chip, 2026-08-19)
                os.environ["LLT2I_FLASH_VMEM_MB"] = extra[1:]
        attn_mod._BLOCK_Q = bq
        attn_mod._BLOCK_K = bk
        loop = make_loop()
        # a variant that fails to compile (e.g. scoped-VMEM OOM) must not
        # kill the rest of the sweep — 2026-08-19 the h2w12 OOM aborted the
        # queued h4/h8 variants and wasted the chip session
        try:
            t0 = time.perf_counter()
            float(loop(params, x0))
            compile_s = time.perf_counter() - t0
            # steady state: 3 timed dispatches with varied inputs
            # (per-dispatch tunnel overhead is identical across variants, so
            # relative numbers are meaningful even if absolute ones carry a
            # constant offset)
            xs = [x0 + 1e-4 * i for i in range(1, 4)]
            jax.block_until_ready(xs)
            t0 = time.perf_counter()
            for xv in xs:
                float(loop(params, xv))
            dt = time.perf_counter() - t0
        except Exception as e:
            print(f"bq x bk {var}: FAILED — {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)
            continue
        per_eval = dt / (len(xs) * n_evals) * 1000
        results[var] = per_eval
        print(f"bq x bk {var}: {per_eval:.1f} ms/eval  "
              f"(compile+first {compile_s:.0f}s)", flush=True)

    if results:
        best = min(results, key=results.get)
        print(f"best: {best} at {results[best]:.1f} ms/eval")


if __name__ == "__main__":
    main()
