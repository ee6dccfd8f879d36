"""Round-4 on-chip sweep: speed x MFU x quality for every queued serving
mode, in ONE process (VERDICT r3 items 1, 2, 4).

Why one process: a cold full bench costs ~26 min through the remote
compiler (PERF.md round-3c), almost all of it process/tunnel/compile
amortizable — in-process variants reuse the backend claim, the resident
weights, and the warm tunnel, so each extra variant costs roughly its
compile + ~30 s of run.

Per variant this measures, with the SAME models and the SAME conditioning:
  * steady-state img/s (scanned multi-iteration dispatch, value-fetch sync,
    warmup bytes != timed bytes — the axon traps in tpu-bench-traps),
  * analytic MFU (utils/flops.py jaxpr walk; enc-cache interpolates the
    is_key cond by its static key fraction),
  * quality delta vs the exact PLMS-50 baseline: the LAST scanned iteration
    uses a FIXED quality noise shared by all b=8 variants, and its decoded
    images are fetched AFTER the timed sync and compared (PSNR / mean abs /
    max abs in [0,1] image space). This is the VERDICT-r3 "mode -> speed x
    measured quality delta" table at SD geometry.

Results append to /tmp/sweep_r4.jsonl as they land (partial progress
survives a pool outage). Variant order is value-first; the b16 variant runs
LAST because a b=16 VAE/UNet peak once crashed the v5e worker (PERF.md) and
a dead worker wedges the lease.

TPU etiquette: one chip job at a time, never wrap in `timeout`.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.environ.get("LLT2I_SWEEP_OUT", "/tmp/sweep_r4.jsonl")


def log(rec):
    line = json.dumps(rec)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(1.0 / mse))


def main():
    from layoutllm_t2i_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from layoutllm_t2i_tpu.pipeline.inference import (InferencePipeline,
                                                      parse_cfg_interval)
    from layoutllm_t2i_tpu.pipeline.loaders import (quantize_unet_int8,
                                                    random_models)
    from layoutllm_t2i_tpu.utils.flops import count_fn_flops, mfu

    on_tpu = jax.default_backend() == "tpu"
    small = os.environ.get("LLT2I_SWEEP_SMALL", "0") == "1"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    t_setup = time.time()
    ckpt = os.environ.get("LLT2I_SWEEP_CKPT")
    if ckpt:
        # round-5 structured-weights re-gate (VERDICT r4 item 3 / weak #3):
        # score the approximate modes' PSNR-vs-exact with a TRAINED
        # checkpoint (non-random weight statistics) instead of random init
        from layoutllm_t2i_tpu.pipeline.loaders import (
            load_models_from_gligen_ckpt,
        )

        models = load_models_from_gligen_ckpt(ckpt, dtype=dtype)
    else:
        models = random_models(seed=0, dtype=dtype, small=small)
    models_q = None  # lazily quantized once, shared by the int8 variants

    # (name, pipeline kwargs, batch, iters, int8, quality?) — quality rows
    # must share the baseline's batch so images are comparable
    B, IT = 8, 3
    VARIANTS = [
        ("base", dict(steps=50, sampler="plms"), B, IT, False),
        ("dpm20", dict(steps=20, sampler="dpm"), B, IT, False),
        ("cfgmid", dict(steps=50, sampler="plms",
                        cfg_interval=(0.1, 0.85)), B, IT, False),
        ("fast", dict(steps=20, sampler="dpm",
                      cfg_interval=(0.1, 0.85)), B, IT, True),
        ("int8", dict(steps=50, sampler="plms"), B, IT, True),
        ("enc2", dict(steps=50, sampler="plms",
                      encoder_cache_interval=2), B, IT, False),
        ("enc3", dict(steps=50, sampler="plms",
                      encoder_cache_interval=3), B, IT, False),
        ("cfg75", dict(steps=50, sampler="plms",
                       cfg_interval=(0.0, 0.75)), B, IT, False),
        ("fastenc2", dict(steps=20, sampler="dpm", cfg_interval=(0.1, 0.85),
                          encoder_cache_interval=2), B, IT, True),
        # round-4 pass 2: the first pass measured int8 LOSING at both b=8
        # (0.954 vs 1.003 base) and b=1 (0.659 vs 0.681 lat_fp), so the
        # preset candidates are re-measured without it
        ("fast2", dict(steps=20, sampler="dpm", cfg_interval=(0.1, 0.85),
                       encoder_cache_interval=2), B, IT, False),
        ("dpmenc2", dict(steps=20, sampler="dpm",
                         encoder_cache_interval=2), B, IT, False),
        ("dpmcfg", dict(steps=20, sampler="dpm",
                        cfg_interval=(0.1, 0.85)), B, IT, False),
        ("lat_fast2", dict(steps=20, sampler="dpm", cfg_interval=(0.1, 0.85),
                           encoder_cache_interval=2), 1, 6, False),
        ("lat_fp", dict(steps=50, sampler="plms"), 1, 6, False),
        ("lat_int8", dict(steps=50, sampler="plms"), 1, 6, True),
        ("lat_int8_ffnq", dict(steps=50, sampler="plms"), 1, 6, True),
        ("lat_fast", dict(steps=20, sampler="dpm",
                          cfg_interval=(0.1, 0.85)), 1, 6, True),
        ("b12", dict(steps=50, sampler="plms"), 12, IT, False),
        ("b16", dict(steps=50, sampler="plms"), 16, IT, False),
        # round-4 pass 3: push the fast preset further — enc3 inside the
        # preset (keys every 3rd of 20 dpm steps) and a 15-step dpm point;
        # the PSNR-vs-exact gate in this sweep decides if either ships
        ("fast3", dict(steps=20, sampler="dpm", cfg_interval=(0.1, 0.85),
                       encoder_cache_interval=3), B, IT, False),
        ("fast15", dict(steps=15, sampler="dpm", cfg_interval=(0.1, 0.85),
                        encoder_cache_interval=2), B, IT, False),
        ("dpm25", dict(steps=25, sampler="dpm"), B, IT, False),
        # tail-cut CFG inside the preset: cfg75 alone measured PSNR 53.9 dB
        # (vs cfgmid's 30.6) at 1.12x — if the composed speed is close to
        # fast2, this is a much better quality x speed point
        ("fastq", dict(steps=20, sampler="dpm", cfg_interval=(0.0, 0.75),
                       encoder_cache_interval=2), B, IT, False),
        # round-5: the tail-cut proved weight-insensitive (36.1 dB random
        # AND structured), so re-try the aggressive points that failed the
        # gate under the mid-cut: dpm-15 and enc3 composed with (0, 0.75)
        ("fastq15", dict(steps=15, sampler="dpm", cfg_interval=(0.0, 0.75),
                         encoder_cache_interval=2), B, IT, False),
        ("fastq3", dict(steps=20, sampler="dpm", cfg_interval=(0.0, 0.75),
                        encoder_cache_interval=3), B, IT, False),
        # round-5 frontier completion beyond the chosen fastq15 preset:
        # dpm-12 and dpm-15+enc3 map where the quality knee actually is
        ("fastq12", dict(steps=12, sampler="dpm", cfg_interval=(0.0, 0.75),
                         encoder_cache_interval=2), B, IT, False),
        ("fastq15e3", dict(steps=15, sampler="dpm", cfg_interval=(0.0, 0.75),
                           encoder_cache_interval=3), B, IT, False),
    ]
    only = set(sys.argv[1:])

    img_size = models.unet_cfg.image_size
    in_ch = models.unet_cfg.in_channels

    def make_noises(seed, b, iters, quality_tail: bool):
        ns = [jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(seed), i),
            (b, img_size, img_size, in_ch), jnp.float32)
            for i in range(iters)]
        if quality_tail:
            # fixed across variants -> decoded images comparable
            ns[-1] = jax.random.normal(jax.random.PRNGKey(777),
                                       ns[-1].shape, jnp.float32)
        return jnp.stack(ns)

    base_images = {}  # batch -> exact-PLMS-50 images of the quality noise
    cond_cache = {}   # batch -> conditioning (identical across variants)
    results = {}

    for name, pkw, b, iters, int8 in VARIANTS:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if int8:
                if models_q is None:
                    models_q = quantize_unet_int8(models)
                mdl = models_q
            else:
                mdl = models
            if name == "lat_int8_ffnq":
                os.environ["LLT2I_FFN_INT8"] = "1"
            else:
                os.environ.pop("LLT2I_FFN_INT8", None)
            # r5: LLT2I_SWEEP_VAE_CHUNK overrides the large-batch decode
            # chunk (VERDICT r4 item 6 — harder chunking as the first
            # b=12/16 remote-compile-OOM lever)
            _vck = os.environ.get("LLT2I_SWEEP_VAE_CHUNK")
            vae_chunk = (int(_vck) if _vck and b > 8
                         else {12: 6, 16: 8}.get(b))
            pipe = InferencePipeline(mdl, guidance_scale=7.5,
                                     alpha_type=(0.3, 0.0, 0.7),
                                     vae_chunk=vae_chunk,
                                     **pkw)
            if b not in cond_cache:
                prompts = ["a dog chasing a frisbee in a park"] * b
                layouts = [([[0.1, 0.3, 0.5, 0.9], [0.55, 0.2, 0.9, 0.5]],
                            ["dog", "frisbee"])] * b
                relations = [["dog chase frisbee"]] * b
                cond_cache[b] = pipe.build_cond(prompts, layouts, relations)
            cond = cond_cache[b]

            def run_all(up, vp, sc, cond, noises):
                # the LAST iteration's decoded images ride the carry (no
                # (iters, b, 512^2, 3) stack in HBM) for the quality compare
                out = jax.eval_shape(
                    lambda nz: pipe._sample_fn(up, vp, sc, cond, nz,
                                               jax.random.PRNGKey(0)),
                    noises[0])
                img0 = jnp.zeros(out.shape, out.dtype)

                def body(carry, nz):
                    img = pipe._sample_fn(up, vp, sc, cond, nz,
                                          jax.random.PRNGKey(0))
                    return img, jnp.sum(img.astype(jnp.float32))
                img_last, sums = jax.lax.scan(body, img0, noises)
                return sums, img_last

            m = pipe.models
            args = (m.unet_params, m.vae_params, m.sd_first_conv, cond)
            noises_w = make_noises(7, b, iters, quality_tail=False)
            noises_t = make_noises(1234, b, iters, quality_tail=True)

            flops = None
            try:
                # key_frac interpolates the is_key cond AT the cond site —
                # a global max pass also charges the warm-start Heun branch
                # every step (flops.py key_frac docstring; PERF.md r4 note a)
                kf = (float(np.mean(pipe._key_steps()))
                      if pipe.encoder_cache_interval else None)
                flops = count_fn_flops(run_all, *args, noises_t, key_frac=kf)
            except Exception as e:
                print(f"[{name}] flop count failed: {e}", flush=True)

            jrun = jax.jit(run_all)
            t_c = time.time()
            sums, _ = jrun(*args, noises_w)
            float(sums[0])  # force execution (block_until_ready can lie)
            compile_s = time.time() - t_c

            t_r = time.time()
            sums, img_q = jrun(*args, noises_t)
            float(np.asarray(sums).sum())  # sync INSIDE the timed region
            dt = time.time() - t_r
            img_q = np.asarray(img_q)  # untimed: execution already synced

            rec = {
                "variant": name, "batch": b, "iters": iters,
                "img_per_sec": round(b * iters / dt, 4),
                "sec_per_img": round(dt / (b * iters), 4),
                "compile_s": round(compile_s, 1),
                "secs": round(time.time() - t0, 1),
            }
            if flops is not None:
                rec["mfu"] = round(mfu(flops, dt), 4)
                rec["tflop_per_img"] = round(flops / (b * iters) / 1e12, 2)
            if name == "base" or (name == "b16" and "base" not in results):
                base_images[b] = img_q
            elif b in base_images:
                ref = base_images[b]
                rec["psnr_vs_exact"] = round(psnr(img_q, ref), 2)
                rec["meanabs_vs_exact"] = round(
                    float(np.mean(np.abs(img_q - ref))), 4)
                rec["maxabs_vs_exact"] = round(
                    float(np.max(np.abs(img_q - ref))), 4)
            results[name] = rec
            log(rec)
        except Exception as e:
            log({"variant": name, "error": f"{type(e).__name__}: {e}"[:500],
                 "secs": round(time.time() - t0, 1)})
            if "UNAVAILABLE" in str(e):
                log({"abort": "pool UNAVAILABLE"})
                break
        finally:
            os.environ.pop("LLT2I_FFN_INT8", None)

    log({"done": True, "total_secs": round(time.time() - t_setup, 1),
         "summary": {k: v.get("img_per_sec") for k, v in results.items()}})


if __name__ == "__main__":
    main()
