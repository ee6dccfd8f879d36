"""Recount encoder-propagation TFLOP/img with the key_frac cond counting.

The round-4 on-chip sweep's enc-cache rows were counted with the old
global-max interpolation, which also charges the PLMS/DPM warm-start Heun
branch at every step (utils/flops.py key_frac docstring) — enc2 came out
ABOVE the exact path, which is impossible. The counts are analytic (an
abstract jax.make_jaxpr walk, no execution), so this runs on CPU and
prints, per enc-cache config: the old interpolated count, the key_frac
count, and their ratio — the published chip rows are corrected by that
ratio (route-specific padding FLOPs cancel in it).

Usage: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/recount_enc_flops.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


CONFIGS = [
    ("enc2", dict(steps=50, sampler="plms", encoder_cache_interval=2), 8),
    ("enc3", dict(steps=50, sampler="plms", encoder_cache_interval=3), 8),
    ("fastenc2", dict(steps=20, sampler="dpm", cfg_interval=(0.1, 0.85),
                      encoder_cache_interval=2), 8),
    ("fast2", dict(steps=20, sampler="dpm", cfg_interval=(0.1, 0.85),
                   encoder_cache_interval=2), 8),
    ("dpmenc2", dict(steps=20, sampler="dpm", encoder_cache_interval=2), 8),
    ("lat_fast2", dict(steps=20, sampler="dpm", cfg_interval=(0.1, 0.85),
                       encoder_cache_interval=2), 1),
]


def main():
    import jax
    import jax.numpy as jnp

    from layoutllm_t2i_tpu.pipeline.inference import InferencePipeline
    from layoutllm_t2i_tpu.pipeline.loaders import random_models
    from layoutllm_t2i_tpu.utils.flops import count_fn_flops

    models = random_models(seed=0, dtype=jnp.float32,
                           small=os.environ.get("LLT2I_SMALL", "0") == "1")
    img_size = models.unet_cfg.image_size
    in_ch = models.unet_cfg.in_channels
    seen = set()
    for name, pkw, b in CONFIGS:
        key = (tuple(sorted(pkw.items(), key=str)), b)
        pipe = InferencePipeline(models, guidance_scale=7.5,
                                 alpha_type=(0.3, 0.0, 0.7), **pkw)
        prompts = ["a dog chasing a frisbee in a park"] * b
        layouts = [([[0.1, 0.3, 0.5, 0.9], [0.55, 0.2, 0.9, 0.5]],
                    ["dog", "frisbee"])] * b
        relations = [["dog chase frisbee"]] * b
        cond = pipe.build_cond(prompts, layouts, relations)
        m = pipe.models
        noise = jnp.zeros((1, b, img_size, img_size, in_ch), jnp.float32)

        def run_all(up, vp, sc, cond, noises):
            def body(carry, nz):
                img = pipe._sample_fn(up, vp, sc, cond, nz,
                                      jax.random.PRNGKey(0))
                return img, jnp.sum(img.astype(jnp.float32))
            img0 = jax.eval_shape(
                lambda nz: pipe._sample_fn(up, vp, sc, cond, nz,
                                           jax.random.PRNGKey(0)), noises[0])
            _, sums = jax.lax.scan(body, jnp.zeros(img0.shape, img0.dtype),
                                   noises)
            return sums

        args = (m.unet_params, m.vae_params, m.sd_first_conv, cond, noise)
        k = float(np.mean(pipe._key_steps()))
        lo = count_fn_flops(run_all, *args)
        hi = count_fn_flops(run_all, *args, cond_mode="max")
        new = count_fn_flops(run_all, *args, key_frac=k)
        old = k * hi + (1.0 - k) * lo
        rec = {"config": name, "batch": b, "key_frac": round(k, 4),
               "tflop_per_img_old": round(old / b / 1e12, 2),
               "tflop_per_img_new": round(new / b / 1e12, 2),
               "ratio_new_over_old": round(new / old, 4),
               "dup_of_prior": key in seen}
        seen.add(key)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
