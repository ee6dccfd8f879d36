"""Capture a jax.profiler trace of the UNet forward (+ VAE decode) for the
PERF.md component breakdown. Writes the trace under --logdir; inspect with
tensorboard or jax.profiler tooling offline.
"""
from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--logdir", type=str, default="/tmp/llt2i_trace")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--vae", action="store_true", help="also trace VAE decode")
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--skip_gated", action="store_true",
                    help="trace the reduced (fuser_scale==0 segment) body")
    args = ap.parse_args()

    from layoutllm_t2i_tpu.models.unet import UNetConfig, init_unet_params, unet_apply
    from layoutllm_t2i_tpu.utils.trees import materialize_params

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = (UNetConfig(image_size=8, model_channels=32, num_res_blocks=1,
                      attention_resolutions=(2, 1), channel_mult=(1, 2),
                      num_heads=2, context_dim=32, grounding_in_dim=32,
                      grounding_out_dim=32)
           if args.small else UNetConfig())
    params = materialize_params(init_unet_params, jax.random.PRNGKey(0), cfg,
                                dtype if on_tpu else None)

    b = args.batch
    g = np.random.default_rng(0)
    mk = lambda *s: jax.device_put(jnp.asarray(g.standard_normal(s), dtype))
    boxes = np.zeros((b, 30, 4), np.float32)
    boxes[:, 0] = [0.1, 0.2, 0.6, 0.8]
    masks = np.zeros((b, 30), np.float32)
    masks[:, 0] = 1
    inputs = dict(
        x=mk(b, cfg.image_size, cfg.image_size, 4),
        t=jax.device_put(jnp.full((b,), 500, jnp.int32)),
        ctx=mk(b, 77, cfg.context_dim),
        boxes=jax.device_put(jnp.asarray(boxes)),
        masks=jax.device_put(jnp.asarray(masks)),
        pos=mk(b, 30, cfg.grounding_in_dim),
        rel=mk(b, 10, cfg.context_dim),
        fscale=jax.device_put(jnp.float32(1.0)),
    )

    # params must be an ARGUMENT: closing over them bakes ~2.5GB of weights
    # into the program as constants and compile time explodes
    @jax.jit
    def fwd(params, i):
        return unet_apply(params, cfg, i["x"], i["t"], i["ctx"], i["boxes"],
                          i["masks"], i["pos"], i["rel"],
                          fuser_scale=i["fscale"], skip_gated=args.skip_gated)

    fwd = functools.partial(fwd, params)
    out = fwd(inputs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for k in range(args.iters):
        inputs["x"] = inputs["x"] + 1e-6  # vary inputs (tunnel caching)
        out = fwd(inputs)
    jax.block_until_ready(out)
    per = (time.perf_counter() - t0) / args.iters * 1000
    print(f"unet fwd b={b}: {per:.1f} ms")

    with jax.profiler.trace(args.logdir):
        inputs["x"] = inputs["x"] + 1e-6
        out = fwd(inputs)
        jax.block_until_ready(out)
    print(f"trace written to {args.logdir}")

    if args.vae:
        from layoutllm_t2i_tpu.models.vae import VAEConfig, decode, init_vae_params

        vcfg = VAEConfig() if not args.small else VAEConfig(ch=32, ch_mult=(1, 2),
                                                            num_res_blocks=1)
        vparams = materialize_params(init_vae_params, jax.random.PRNGKey(1),
                                     vcfg, dtype if on_tpu else None)
        z = mk(4, cfg.image_size, cfg.image_size, 4)
        dec = functools.partial(jax.jit(lambda p, z: decode(p, vcfg, z)), vparams)
        img = dec(z)
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        img = dec(z + 1e-6)
        jax.block_until_ready(img)
        print(f"vae decode b=4: {(time.perf_counter() - t0) * 1000:.1f} ms")


if __name__ == "__main__":
    main()
