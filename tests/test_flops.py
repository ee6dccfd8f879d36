"""utils/flops.py: jaxpr FLOP counting used for bench.py's MFU field.

Closed-form checks: dot_general, conv, scan multiplication, pallas_call
grid multiplication — the cases the MFU number depends on (XLA's own
cost_analysis can't see Pallas custom-call FLOPs)."""
import jax
import jax.numpy as jnp
import numpy as np

from layoutllm_t2i_tpu.utils.flops import count_fn_flops, count_jaxpr_flops, mfu


def test_dot_flops():
    f = lambda a, b: a @ b
    got = count_fn_flops(f, jnp.ones((8, 16)), jnp.ones((16, 32)))
    assert got == 2 * 8 * 16 * 32


def test_batched_dot_flops():
    f = lambda a, b: jnp.einsum("bij,bjk->bik", a, b)
    got = count_fn_flops(f, jnp.ones((4, 8, 16)), jnp.ones((4, 16, 32)))
    assert got == 2 * 4 * 8 * 16 * 32


def test_conv_flops():
    f = lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = count_fn_flops(f, jnp.ones((2, 8, 8, 3)), jnp.ones((3, 3, 3, 16)))
    assert got == 2 * (2 * 8 * 8 * 16) * (3 * 3) * 3


def test_scan_multiplies_by_length():
    def f(x, w):
        def body(h, _):
            return jnp.tanh(h @ w), ()
        out, _ = jax.lax.scan(body, x, None, length=7)
        return out
    got = count_fn_flops(f, jnp.ones((8, 8)), jnp.ones((8, 8)))
    assert got == 7 * 2 * 8 * 8 * 8


def test_pallas_grid_multiplies():
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], x_ref[...])

    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((16, 16), jnp.float32),
            grid=(5,),
            in_specs=[pl.BlockSpec((16, 16), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((16, 16), lambda i: (0, 0)),
            interpret=True,
        )(x)

    got = count_fn_flops(f, jnp.ones((16, 16)))
    assert got == 5 * 2 * 16 * 16 * 16


def test_sampler_flops_sane():
    """The tiny bench pipeline's counted FLOPs: positive, and invariant
    between the Pallas and XLA attention routes (same math, different
    partitioning — the whole reason cost_analysis isn't used)."""
    from layoutllm_t2i_tpu.models.unet import (UNetConfig, init_unet_params,
                                               unet_apply)

    cfg = UNetConfig(image_size=8, model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2, 1), channel_mult=(1, 2),
                     num_heads=2)
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    b = 2
    x = jnp.ones((b, 8, 8, cfg.in_channels))
    t = jnp.zeros((b,), jnp.int32)
    ctx = jnp.ones((b, 77, cfg.context_dim))
    boxes = jnp.zeros((b, 30, 4))
    masks = jnp.ones((b, 30))
    pos = jnp.ones((b, 30, cfg.grounding_in_dim))
    rel = jnp.ones((b, 10, cfg.context_dim))

    def f(p):
        return unet_apply(p, cfg, x, t, ctx, boxes, masks, pos, rel,
                          fuser_scale=jnp.float32(1.0))

    got = count_fn_flops(f, params)
    assert got > 1e6
    assert mfu(got, 1.0) > 0


def test_mfu_zero_time():
    assert mfu(1e12, 0.0) == 0.0


def test_key_frac_interpolates_only_nonzero_cheap_conds():
    """key_frac counting (encoder-propagation MFU): a scan body shaped like
    the samplers' — an is_key cond whose CHEAP branch still does matmuls
    (decoder-only forward) plus a warm-start cond whose cheap branch is a
    zero-matmul linear combination (Adams-Bashforth). key_frac must
    interpolate the first and take min on the second; the round-4 global
    max pass charged the warm branch every step and reported enc2 above
    the exact path (PERF.md round 4, note a)."""
    n = 8
    steps = 10
    k = 0.5
    w = jnp.ones((n, n))
    full = 2 * n * n * n          # one n x n x n matmul

    def f(x):
        def body(carry, inp):
            h, count = carry
            is_key = inp
            # is_key cond: full forward (2 matmuls) vs decoder-only (1)
            h = jax.lax.cond(is_key,
                             lambda a: (a @ w) @ w,
                             lambda a: a @ w, h)
            # warm-start cond: heun (1 matmul) vs AB combo (0 matmuls)
            h = jax.lax.cond(count == 0,
                             lambda a: a @ w,
                             lambda a: 1.5 * a - 0.5 * a, h)
            return (h, count + 1), ()
        keys = jnp.arange(steps) % 2 == 0
        (h, _), _ = jax.lax.scan(body, (x, jnp.int32(0)), keys)
        return h

    x = jnp.ones((n, n))
    got = count_fn_flops(f, x, key_frac=k)
    # is_key cond: k*2 + (1-k)*1 matmuls/step; warm cond: min branch = 0
    want = steps * (k * 2 * full + (1 - k) * full)
    assert got == want
    # the old global-max bracketing overcounts by the warm branch per step
    hi = count_fn_flops(f, x, cond_mode="max")
    assert hi == steps * (2 * full + full)
    # and without key_frac, min stays the steady-state count
    assert count_fn_flops(f, x) == steps * full
