"""Compile the b=8 UNet forward for TPU and dump the optimized HLO text.

Used to map profiler trace op names (fusion.NNNN, add_add_fusion.N, ...) back
to concrete fused computations with shapes, so perf work targets real ops
instead of guesses. Output: --out (default /tmp/unet_hlo.txt).
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", type=str, default="/tmp/unet_hlo.txt")
    ap.add_argument("--vae", action="store_true", help="dump VAE decode instead")
    args = ap.parse_args()

    from layoutllm_t2i_tpu.models.unet import UNetConfig, init_unet_params, unet_apply
    from layoutllm_t2i_tpu.utils.trees import materialize_params

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    if args.vae:
        from layoutllm_t2i_tpu.models.vae import VAEConfig, decode, init_vae_params

        vcfg = VAEConfig()
        vparams = materialize_params(init_vae_params, jax.random.PRNGKey(1), vcfg, dtype)
        z = jnp.zeros((4, 64, 64, 4), dtype)
        lowered = jax.jit(lambda p, z: decode(p, vcfg, z)).lower(vparams, z)
    else:
        cfg = UNetConfig()
        params = materialize_params(init_unet_params, jax.random.PRNGKey(0), cfg, dtype)
        b = args.batch
        g = np.random.default_rng(0)
        mk = lambda *s: jnp.asarray(g.standard_normal(s), dtype)
        inputs = (
            mk(b, cfg.image_size, cfg.image_size, 4),
            jnp.full((b,), 500, jnp.int32),
            mk(b, 77, cfg.context_dim),
            jnp.asarray(np.tile([[0.1, 0.2, 0.6, 0.8]], (b, 30, 1)), jnp.float32),
            jnp.asarray(np.ones((b, 30)), jnp.float32),
            mk(b, 30, cfg.grounding_in_dim),
            mk(b, 10, cfg.context_dim),
        )

        def fwd(params, x, t, ctx, boxes, masks, pos, rel):
            return unet_apply(params, cfg, x, t, ctx, boxes, masks, pos, rel,
                              fuser_scale=jnp.float32(1.0))

        lowered = jax.jit(fwd).lower(params, *inputs)

    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {args.out}")


if __name__ == "__main__":
    main()
