"""Training-step throughput bench (512^2, rela_fuse mode, single chip).

Prints one JSON line: {"metric": "train_imgs_per_sec", ...}. Compares against
the round-1 number (435 ms/step at b=4 on the XLA attention path, PERF.md);
the step now differentiates through the Pallas flash kernels
(LLT2I_DISABLE_FLASH=1 to A/B the XLA path).
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--mixed_precision", action="store_true",
                    help="bf16 compute with f32 master weights")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation microbatches per step "
                         "(--batch is the effective batch)")
    ap.add_argument("--trace", type=str, default=None,
                    help="write a jax.profiler device trace to this dir")
    args = ap.parse_args()

    from layoutllm_t2i_tpu.models.unet import UNetConfig, init_unet_params
    from layoutllm_t2i_tpu.ops.schedules import make_ddpm_schedule
    from layoutllm_t2i_tpu.training.train_step import (
        TrainStepConfig, init_partitioned_state, make_partitioned_train_step,
    )
    from layoutllm_t2i_tpu.utils.trees import materialize_params

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    if args.small:
        cfg = UNetConfig(image_size=8, model_channels=32, num_res_blocks=1,
                         attention_resolutions=(2, 1), channel_mult=(1, 2),
                         num_heads=2, context_dim=32, grounding_in_dim=32,
                         grounding_out_dim=32)
    else:
        cfg = UNetConfig()
    schedule = make_ddpm_schedule("linear", 1000, 0.00085, 0.012)
    params = materialize_params(init_unet_params, jax.random.PRNGKey(0), cfg,
                                dtype if on_tpu else None)
    tcfg = TrainStepConfig(unet_cfg=cfg, schedule=schedule,
                           trainable_mode="rela_fuse", warmup_steps=0,
                           total_steps=1000, remat=args.remat,
                           mixed_precision=args.mixed_precision,
                           accum_steps=args.accum)
    state, frozen = init_partitioned_state(tcfg, params)
    step_inner = make_partitioned_train_step(tcfg)

    # run --iters steps inside ONE jitted scan: per-dispatch tunnel latency
    # plus per-call host processing of the ~3000-array state pytree would
    # otherwise dominate per-step timings (PERF.md measurement traps)
    @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(4,))
    def multi_step(state, frozen, batch, rng, iters):
        def body(s, i):
            s2, loss = step_inner(s, frozen, batch, jax.random.fold_in(rng, i))
            return s2, loss
        return jax.lax.scan(body, state, jnp.arange(iters))

    b = args.batch
    g = np.random.default_rng(0)
    mk = lambda *s: jax.device_put(jnp.asarray(
        g.standard_normal(s).astype(np.float32), dtype))
    boxes = np.zeros((b, 30, 4), np.float32)
    boxes[:, 0] = [0.1, 0.2, 0.6, 0.8]
    boxes[:, 1] = [0.5, 0.5, 0.9, 0.9]
    masks = np.zeros((b, 30), np.float32)
    masks[:, :2] = 1
    batch = {
        "z": mk(b, cfg.image_size, cfg.image_size, 4),
        "context": mk(b, 77, cfg.context_dim),
        "boxes": jax.device_put(jnp.asarray(boxes)),
        "masks": jax.device_put(jnp.asarray(masks)),
        "phrase_embeddings": mk(b, 30, cfg.grounding_in_dim),
        "relations": mk(b, 10, cfg.context_dim),
        "grounding_extra": None,
    }

    rng = jax.random.PRNGKey(1)
    state, losses = multi_step(state, frozen, batch, rng, args.iters)
    float(losses[-1])  # compile+first; value fetch forces real sync
    # second warmup: the first call passed host-built (uncommitted) state, so
    # the next call with device-resident donated buffers triggers a SILENT
    # aliasing recompile (~minutes through the remote compiler) — absorb it
    # here, outside the timed region (PERF.md measurement trap a)
    state, losses = multi_step(state, frozen, batch,
                               jax.random.fold_in(rng, 1), args.iters)
    float(losses[-1])
    if args.trace:
        with jax.profiler.trace(args.trace):
            state, losses = multi_step(state, frozen, batch,
                                       jax.random.fold_in(rng, 3), args.iters)
            float(losses[-1])
        print(f"trace written to {args.trace}")
    t0 = time.perf_counter()
    state, losses = multi_step(state, frozen, batch,
                               jax.random.fold_in(rng, 7), args.iters)
    loss = losses[-1]
    float(loss)
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "train_imgs_per_sec",
        "value": round(b / dt, 4),
        "unit": "img/s",
        "ms_per_step": round(dt * 1000, 2),
        "loss": round(float(loss), 4),
        "batch": b,
        "remat": args.remat,
        "mixed_precision": args.mixed_precision,
        "accum": args.accum,
    }))


if __name__ == "__main__":
    main()
