"""Time the VAE decode in isolation (scanned dispatch, value-sync).

PERF.md carried a round-1 "219 ms / b=4" decode number that was never
re-measured after the bf16 fixes; this measures the current truth and the
per-component split (decode vs the norm fallbacks) so VAE work targets real
cost. Optionally captures a profiler trace (--trace).
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace", type=str, default=None,
                    help="profiler trace logdir (one traced dispatch)")
    ap.add_argument("--encode", action="store_true", help="also time encode")
    args = ap.parse_args()

    from layoutllm_t2i_tpu.models.vae import (
        VAEConfig, decode, encode, init_vae_params)
    from layoutllm_t2i_tpu.utils.compile_cache import enable_persistent_cache
    from layoutllm_t2i_tpu.utils.trees import materialize_params

    enable_persistent_cache()
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    cfg = VAEConfig()
    params = materialize_params(init_vae_params, jax.random.PRNGKey(0), cfg, dtype)

    b = args.batch
    g = np.random.default_rng(0)
    zs = jnp.asarray(g.standard_normal((args.iters, b, 64, 64, 4)), dtype)

    @jax.jit
    def run_all(params, zs):
        def body(c, z):
            img = decode(params, cfg, z)
            return c, jnp.sum(img.astype(jnp.float32))
        _, sums = jax.lax.scan(body, 0, zs)
        return sums

    # warmup/compile, then time a DIFFERENT byte pattern (tunnel trap)
    np.asarray(run_all(params, zs))
    zs2 = jnp.asarray(g.standard_normal(zs.shape), dtype)
    t0 = time.perf_counter()
    np.asarray(run_all(params, zs2))
    dt = time.perf_counter() - t0
    per = dt / args.iters * 1000
    print(f"decode b={b}: {per:.1f} ms/call  ({per / b:.1f} ms/img)", flush=True)

    if args.trace:
        with jax.profiler.trace(args.trace):
            np.asarray(run_all(params, zs))
        print(f"trace written to {args.trace}")

    if args.encode:
        imgs = jnp.asarray(g.standard_normal((args.iters, b, 512, 512, 3)), dtype)

        @jax.jit
        def run_enc(params, imgs):
            def body(c, im):
                z = encode(params, cfg, im, rng=jax.random.PRNGKey(0), sample=True)
                return c, jnp.sum(z.astype(jnp.float32))
            _, sums = jax.lax.scan(body, 0, imgs)
            return sums

        np.asarray(run_enc(params, imgs))
        imgs2 = jnp.asarray(g.standard_normal(imgs.shape), dtype)
        t0 = time.perf_counter()
        np.asarray(run_enc(params, imgs2))
        dt = time.perf_counter() - t0
        print(f"encode b={b}: {dt / args.iters * 1000:.1f} ms/call")


if __name__ == "__main__":
    main()
