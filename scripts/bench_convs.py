"""On-chip microbench of 3x3 conv formulations for the UNet/VAE hot shapes.

The round-2 HLO dump showed XLA's chosen conv emitters running at ~20-25% MFU
on the (8,64,64,320..960) UNet sites (estimated_cycles ~1.8M for a 60 GFLOP
conv). This compares, per shape, with the loop inside one jitted scan (one
dispatch per timing; tunnel per-dispatch latency is constant across variants):

  * conv    — lax.conv_general_dilated NHWC/HWIO (production path)
  * shift9  — sum of 9 shifted (HW, Cin) x (Cin, Cout) dots over a spatially
              pre-padded input (no im2col materialization; K=Cin per dot)
  * im2col  — explicit (B*HW, 9*Cin) patch matrix then one big dot

Prints ms/call per (shape, formulation).
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


def conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_shift9(x, w):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((b, h, wd, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = xp[:, dy:dy + h, dx:dx + wd, :]
            acc = acc + jax.lax.dot_general(
                sl, w[dy, dx], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def conv_im2col(x, w):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + wd, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1)          # (B, H, W, 9*Cin)
    wmat = w.reshape(9 * cin, cout)
    out = jax.lax.dot_general(patches, wmat, (((3,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


FORMS = {"conv": conv_ref, "shift9": conv_shift9, "im2col": conv_im2col}

SHAPES = [
    (8, 64, 64, 320, 320),
    (8, 64, 64, 640, 320),
    (8, 64, 64, 960, 320),
    (8, 32, 32, 640, 640),
    (4, 512, 512, 128, 128),
    (4, 256, 256, 256, 256),
]

# batch-scaling probe: bf16 conv emitters pack batch into (16, 128) sublane
# tiles, so small batches may waste sublane occupancy
SHAPES_B16 = [
    (16, 64, 64, 320, 320),
    (16, 64, 64, 640, 320),
    (16, 32, 32, 640, 640),
    (8, 512, 512, 128, 128),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--forms", type=str, default="conv,shift9,im2col")
    ap.add_argument("--b16", action="store_true", help="batch-scaling shapes")
    args = ap.parse_args()

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    g = np.random.default_rng(0)

    for (b, h, wd, cin, cout) in (SHAPES_B16 if args.b16 else SHAPES):
        x0 = jnp.asarray(g.standard_normal((b, h, wd, cin)) * 0.1, dtype)
        w = jnp.asarray(g.standard_normal((3, 3, cin, cout)) * 0.02, dtype)
        gflop = 2 * 9 * cin * cout * b * h * wd / 1e9
        for name in args.forms.split(","):
            fn = FORMS[name]

            @jax.jit
            def loop(x, w):
                def body(c, _):
                    y = fn(c, w)
                    # keep carry shape = input shape and data-dependent
                    return (c + 0.001 * y[..., :cin] if cout >= cin
                            else c + 0.001 * jnp.pad(y, ((0, 0),) * 3 + ((0, cin - cout),))), ()
                out, _ = jax.lax.scan(body, x, jnp.arange(args.iters))
                # scalar result: fetching its VALUE forces real execution
                # (block_until_ready alone returns early through the tunnel)
                return jnp.sum(out.astype(jnp.float32))

            s = float(loop(x0, w))
            xs = [x0 + 1e-4 * i for i in range(1, 3)]
            jax.block_until_ready(xs)
            t0 = time.perf_counter()
            acc = 0.0
            for xv in xs:
                acc += float(loop(xv, w))
            per = (time.perf_counter() - t0) / (2 * args.iters) * 1000
            mfu = gflop / per / 197  # v5e bf16 peak 197 TFLOP/s => GFLOP/ms
            print(f"{(b,h,wd,cin,cout)} {name:7s}: {per:7.3f} ms  "
                  f"({gflop:5.1f} GFLOP, {100*mfu:4.1f}% MFU)", flush=True)


if __name__ == "__main__":
    main()
