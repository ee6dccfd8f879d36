"""Headline benchmark: 512px layout-grounded generation throughput per chip.

Runs the flagship pipeline (SD-1.4-scale relation-aware UNet, PLMS-50,
CFG 7.5, alpha [0.3, 0, 0.7], 30 grounding slots, 5 relation tokens, VAE
decode) with random weights and measures steady-state images/sec on one chip.

Prints ONE JSON line:
  {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": N / 8.0, ...}
(the 8 img/s/chip target comes from BASELINE.md).

The default invocation measures BOTH headlines in one process (weights
stay resident, the second compile is the only extra cost):
  * the exact PLMS-50 config — `value` / `vs_baseline` (unchanged lineage
    since round 1), and
  * the `--fast` serving preset (DPM-Solver++ 15 steps + CFG interval
    0,0.75 tail-cut + encoder cache 2; VERDICT r3 item 1's "second headline") —
    `fast_*` fields, including a LIVE quality gate: both configs sample
    the same final noise with the same weights, and `fast_psnr_vs_exact_db`
    is the PSNR between their decoded 512² images, measured fresh on every
    bench run (not quoted from a past sweep).
Any non-default knob (--fast, --latency, --int8, explicit
sampler/steps/intervals, --sharded) measures that single config only, as
before — A/B sweeps should not pay a second compile. --trace alone stays
dual and captures BOTH program traces (<dir>/exact, <dir>/fast).
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32) - np.asarray(b, np.float32)) ** 2))
    return float("inf") if mse == 0 else 10.0 * float(np.log10(1.0 / mse))


def main():
    ap = argparse.ArgumentParser()
    # batch 8 measured best end-to-end in round 2 (0.635 vs 0.620 at b=4;
    # b=16 crashes the v5e worker in the UNet b=32 path — see PERF.md)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", type=str, default="plms",
                    choices=["plms", "ddim", "dpm"],
                    help="dpm = DPM-Solver++(2M) (arXiv:2211.01095): "
                         "PLMS-50-class quality at ~20 steps — pair with "
                         "--steps 20 for the few-step serving config "
                         "(separate PERF line; headline stays PLMS-50)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--small", action="store_true", help="tiny model for CPU smoke")
    ap.add_argument("--guidance", type=float, default=7.5)
    ap.add_argument("--vae_chunk", type=int, default=8,
                    help="decode the VAE in chunks of this batch size (peak-"
                         "HBM cap; 0 = whole batch at once)")
    ap.add_argument("--trace", type=str, default=None,
                    help="after the timed run, capture a jax.profiler trace "
                         "of one dispatch to this logdir (aggregate with "
                         "scripts/analyze_trace.py)")
    ap.add_argument("--latency", action="store_true",
                    help="report p50 single-image latency instead of "
                         "throughput (forces batch 1; BASELINE.md tracks "
                         "p50 image latency alongside img/s)")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 UNet (per-channel scales, dequant "
                         "fused into the consuming dots; ops/quant.py). "
                         "Measured a speed LOSS on chip at both b=8 and b=1 "
                         "(PERF.md round 4) — opt-in for HBM-footprint-"
                         "constrained deployments only")
    ap.add_argument("--cache_encoder", type=int, default=0,
                    help="encoder propagation interval N (arXiv:2312.09608): "
                         "run the UNet encoder every Nth step, reuse cached "
                         "skips in between. APPROXIMATE (not bit-exact); "
                         "0/1 = exact default")
    ap.add_argument("--cfg_interval", type=str, default=None,
                    help="LO,HI step fractions where CFG applies "
                         "(arXiv:2404.07724); outside, cond-only at half "
                         "the batch — exact FLOP cut, published quality "
                         "GAIN. e.g. 0.1,0.85 (paper-faithful: high-noise steps off)")
    ap.add_argument("--sharded", action="store_true",
                    help="shard the prompt batch over ALL local devices "
                         "(prompt-DP, params replicated) — the multi-chip "
                         "scaling mode; on one chip it compiles the same "
                         "program with explicit shardings")
    ap.add_argument("--fast", action="store_true",
                    help="serving fast preset ONLY: DPM-Solver++ 15 steps + "
                         "CFG interval 0,0.75 + encoder cache 2 (int8 "
                         "measured as a LOSS at both b=8 and b=1 and is not "
                         "included). Explicit flags override preset pieces. "
                         "The default invocation already measures this "
                         "preset alongside the exact headline")
    ap.add_argument("--no_fast", action="store_true",
                    help="skip the fast-preset second measurement in the "
                         "default invocation (halves chip time)")
    args = ap.parse_args()
    # dual mode: the plain default invocation (the driver's) measures the
    # exact headline AND the fast preset; any explicit A/B knob opts out.
    # --trace does NOT opt out: in dual mode it captures BOTH program
    # traces (<dir>/exact and <dir>/fast) in one chip process — two cold
    # processes would cost ~25 min of extra claim+compile each.
    dual = not (args.fast or args.no_fast or args.latency
                or args.int8 or args.sharded
                or args.sampler != "plms" or args.steps != 50
                or args.cfg_interval is not None or args.cache_encoder != 0)
    if args.fast:
        from layoutllm_t2i_tpu.pipeline import presets

        if args.sampler == "plms":
            args.sampler = presets.FAST_SAMPLER
            if args.steps == 50:
                args.steps = presets.FAST_STEPS
        if args.cfg_interval is None:
            args.cfg_interval = presets.fast_cfg_interval_str()
        if args.cache_encoder == 0:
            args.cache_encoder = presets.FAST_CACHE_ENCODER
        metric_suffix = "_fast"
    else:
        metric_suffix = ""

    from layoutllm_t2i_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from layoutllm_t2i_tpu.models.unet import UNetConfig, init_unet_params
    from layoutllm_t2i_tpu.models.vae import VAEConfig, init_vae_params
    from layoutllm_t2i_tpu.models.clip_text import CLIPTextConfig, init_clip_text_params
    from layoutllm_t2i_tpu.models.clip_tokenizer import HashTokenizer
    from layoutllm_t2i_tpu.ops.schedules import make_ddpm_schedule
    from layoutllm_t2i_tpu.pipeline.inference import (
        GligenModels, InferencePipeline, parse_cfg_interval)
    from layoutllm_t2i_tpu.utils.flops import count_fn_flops, mfu, peak_tflops
    from layoutllm_t2i_tpu.utils.trees import jitted_init

    t_claim = time.perf_counter()
    on_tpu = jax.default_backend() == "tpu"
    print(f"[bench] backend claim {time.perf_counter() - t_claim:.1f}s "
          f"({jax.devices()[0]})", flush=True)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if args.small:
        unet_cfg = UNetConfig(image_size=8, model_channels=32, num_res_blocks=1,
                              attention_resolutions=(2, 1), channel_mult=(1, 2),
                              num_heads=2)
        vae_cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
        clip_cfg = CLIPTextConfig(num_layers=2, vocab_size=1024)
    else:
        unet_cfg = UNetConfig()             # SD-1.4 relation-aware
        vae_cfg = VAEConfig()               # f8/z4
        clip_cfg = CLIPTextConfig()         # ViT-L/14 text

    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    models = GligenModels(
        unet_cfg=unet_cfg,
        unet_params=jitted_init(init_unet_params, k1, unet_cfg, dtype),
        vae_cfg=vae_cfg,
        vae_params=jitted_init(init_vae_params, k2, vae_cfg, dtype),
        clip_cfg=clip_cfg,
        clip_params=jitted_init(init_clip_text_params, k3, clip_cfg, dtype),
        schedule=make_ddpm_schedule("linear", 1000, 0.00085, 0.012),
        tokenizer=HashTokenizer(vocab_size=clip_cfg.vocab_size),
        compute_dtype=dtype,
    )
    if args.int8:
        from layoutllm_t2i_tpu.pipeline.loaders import quantize_unet_int8

        models = quantize_unet_int8(models)

    def make_pipe(**overrides):
        kw = dict(steps=args.steps, sampler=args.sampler,
                  guidance_scale=args.guidance,
                  alpha_type=(0.3, 0.0, 0.7),
                  vae_chunk=args.vae_chunk or None,
                  encoder_cache_interval=args.cache_encoder,
                  cfg_interval=parse_cfg_interval(args.cfg_interval))
        kw.update(overrides)
        return InferencePipeline(models, **kw)

    pipe = make_pipe()

    if args.latency:
        args.batch = 1
    b = args.batch
    prompts = ["a dog chasing a frisbee in a park"] * b
    layouts = [([[0.1, 0.3, 0.5, 0.9], [0.55, 0.2, 0.9, 0.5]], ["dog", "frisbee"])] * b
    relations = [["dog chase frisbee"]] * b

    cond = pipe.build_cond(prompts, layouts, relations)
    noise_shape = (b, unet_cfg.image_size, unet_cfg.image_size,
                   unet_cfg.in_channels)

    # vary inputs per iteration AND between warmup/timed dispatches: repeated
    # byte-identical remote executions can be served bogus-fast by the tunnel
    # layer, so the timed call must not repeat the warmup call's bytes
    def make_noises(seed):
        return jnp.stack([
            jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(seed), i),
                              noise_shape, jnp.float32)
            for i in range(args.iters)
        ])

    noises = make_noises(7)
    noises_timed = make_noises(1234)

    def measure(p, trace_dir=None):
        """One config: compile, timed scanned dispatch, MFU. Returns the
        result dict + the LAST timed iteration's decoded images (rides the
        scan carry — no (iters,b,512²,3) stack in HBM; fetched untimed,
        after the sum sync) for the dual-mode quality compare."""
        # all iterations inside ONE jitted scan: measures steady-state device
        # throughput; per-dispatch tunnel latency (~2s/call through axon)
        # would otherwise dominate the timed region
        def run_all_fn(unet_params, vae_params, sd_conv, cond, noises):
            out = jax.eval_shape(
                lambda nz: p._sample_fn(unet_params, vae_params, sd_conv,
                                        cond, nz, jax.random.PRNGKey(0)),
                noises[0])
            img0 = jnp.zeros(out.shape, out.dtype)

            def body(carry, nz):
                img = p._sample_fn(unet_params, vae_params, sd_conv, cond,
                                   nz, jax.random.PRNGKey(0))
                return img, jnp.sum(img.astype(jnp.float32))
            img_last, sums = jax.lax.scan(body, img0, noises)
            return sums, img_last

        if args.sharded:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from layoutllm_t2i_tpu.parallel.mesh import make_mesh

            n_dev = jax.device_count()
            assert b % n_dev == 0, f"--batch {b} must divide over {n_dev} devices"
            mesh = make_mesh(n_dev)
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            run_all = jax.jit(
                run_all_fn,
                in_shardings=(repl, repl, repl, data,
                              NamedSharding(mesh, P(None, "data"))),
                out_shardings=repl,
            )
        else:
            run_all = jax.jit(run_all_fn)

        m = p.models
        args_all = (m.unet_params, m.vae_params, m.sd_first_conv, cond)

        # analytic MXU-FLOP count of the timed program (jaxpr walk: scans x
        # length, pallas kernels x grid — XLA cost_analysis can't see custom
        # calls); emitted as tflops_per_sec + mfu so every A/B self-reports
        # its roofline position (VERDICT r3 item 4)
        try:
            # key_frac: encoder-propagation's per-step is_key cond alternates
            # at a static fraction k — interpolated at the cond site (a
            # global max pass wrongly charges the warm-start Heun branch
            # every step; see flops.py key_frac docstring)
            kf = (float(np.mean(p._key_steps()))
                  if p.encoder_cache_interval else None)
            total_flops = count_fn_flops(run_all_fn, *args_all, noises,
                                         key_frac=kf)
        except Exception as e:  # never let accounting kill the bench
            print(f"[bench] flop count failed: {e}", flush=True)
            total_flops = None
        # warmup / compile (same scan length so only ONE program is
        # compiled); fetch VALUES, not just block_until_ready — the remote
        # tunnel can return from block_until_ready before execution finishes.
        # The compile+warmup wall is printed per mode so warm-vs-cold runs
        # decompose (persistent-cache A/Bs, PERF.md r5)
        t_c = time.perf_counter()
        sums, _ = run_all(*args_all, noises)
        float(np.asarray(sums).sum())
        print(f"[bench] compile+warmup {time.perf_counter() - t_c:.1f}s",
              flush=True)

        t0 = time.perf_counter()
        sums, img_last = run_all(*args_all, noises_timed)
        float(np.asarray(sums).sum())  # sync INSIDE the timed region
        dt = time.perf_counter() - t0
        img_last = np.asarray(img_last)  # untimed: execution already synced

        if trace_dir:
            noises_tr = make_noises(99)
            with jax.profiler.trace(trace_dir):
                sums, _ = run_all(*args_all, noises_tr)
                float(np.asarray(sums).sum())

        rec = {"imgs_per_sec": b * args.iters / dt, "dt": dt}
        if total_flops is not None:
            n_chips = jax.device_count() if args.sharded else 1
            rec.update(
                tflops_per_sec=round(total_flops / dt / 1e12, 2),
                mfu=round(mfu(total_flops, dt, n_chips), 4),
                peak_tflops=peak_tflops(),
                flops_per_image=round(total_flops / (b * args.iters) / 1e12, 3),
            )
        return rec, img_last

    trace_exact = (args.trace + "/exact" if args.trace and dual else args.trace)
    rec, img_exact = measure(pipe, trace_dir=trace_exact)
    imgs_per_sec = rec.pop("imgs_per_sec")
    dt = rec.pop("dt")

    if args.latency:
        # steady-state DEVICE latency (batch=1, iterations scanned in one
        # dispatch): a mean, not a percentile — per-iteration samples don't
        # exist inside a scan, and per-dispatch host timings here would
        # measure the axon tunnel (~2 s/call), not the framework. The true
        # serving p50/p99 (incl. dispatch) is what cli.serve /metrics
        # reports. vs_baseline is the throughput-equivalent ratio against
        # the 8 img/s target (monotone; no latency baseline exists,
        # BASELINE.md).
        print(json.dumps({
            "metric": "image_latency_steady_state_mean" + metric_suffix,
            "value": round(dt / args.iters, 4),
            "unit": "s/img",
            "vs_baseline": round(imgs_per_sec / 8.0, 4),
            **rec,
        }))
        return

    out = {
        "metric": "images_per_sec_per_chip" + metric_suffix,
        "value": round(imgs_per_sec, 4),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / 8.0, 4),
        **rec,
    }
    if dual:
        # second headline: the --fast serving preset, same weights + same
        # timed noise stack -> the decoded-image PSNR against the exact run
        # is a live quality gate (VERDICT r3 items 1+2). Guarded: a fast-
        # path failure (compile blip, pool hiccup on the second program)
        # must never cost the exact headline the driver records.
        try:
            from layoutllm_t2i_tpu.pipeline import presets

            pipe_fast = make_pipe(steps=presets.FAST_STEPS,
                                  sampler=presets.FAST_SAMPLER,
                                  cfg_interval=presets.FAST_CFG_INTERVAL,
                                  encoder_cache_interval=presets.FAST_CACHE_ENCODER)
            frec, img_fast = measure(
                pipe_fast,
                trace_dir=args.trace + "/fast" if args.trace else None)
            out.update(
                fast_value=round(frec["imgs_per_sec"], 4),
                fast_vs_baseline=round(frec["imgs_per_sec"] / 8.0, 4),
                fast_psnr_vs_exact_db=round(_psnr(img_fast, img_exact), 2),
            )
            for k_ in ("tflops_per_sec", "mfu", "flops_per_image"):
                if k_ in frec:
                    out["fast_" + k_] = frec[k_]
        except Exception as e:
            out["fast_error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(out))


def _run_with_outage_retry():
    """Re-exec this script (fresh process -> fresh backend init) if the TPU
    pool claim fails with the transient UNAVAILABLE signature, bounded by
    LLT2I_BENCH_RETRY. A failed claim already blocks ~25 min before erroring,
    so two retries cover a ~1-2 h pool blip without hand-holding; a longer
    outage still fails fast enough for the caller to notice."""
    import os
    import sys

    # transient remote-backend signatures worth a bounded re-exec:
    #   UNAVAILABLE              — pool claim blip (~25 min to surface)
    #   response body closed ... — tunnel dropped a remote_compile reply
    #                              mid-read (observed 2026-08-21, one-off)
    _TRANSIENT = ("UNAVAILABLE", "response body closed before all bytes")

    try:
        main()
    except RuntimeError as e:
        sig = next((t for t in _TRANSIENT if t in str(e)), None)
        if sig is None:
            raise
        tries = int(os.environ.get("LLT2I_BENCH_RETRY", "0"))
        if tries >= 2:
            raise
        wait = 300 if sig == "UNAVAILABLE" else 30
        print(f"[bench] transient backend error [{sig}] (attempt "
              f"{tries + 1}); sleeping {wait}s and retrying",
              file=sys.stderr, flush=True)
        time.sleep(wait)
        os.environ["LLT2I_BENCH_RETRY"] = str(tries + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    _run_with_outage_retry()
