"""Fully fused GEGLU FeedForward Pallas kernel (up-proj + gate + down-proj
+ residual in ONE kernel, the (M, inner) intermediate never touches HBM).

Motivation (PERF.md round 3): in the skip-gated UNet step the FF pair is the
largest fusion cost. At the 64² sites XLA materializes the (B·4096, 2·inner)
GEGLU projection to HBM (336 MB at b=16) and re-reads it for the gating +
down-projection fusion, which the trace shows running at ~36% of roofline.
Round 2's geglu_fused kernel (matmul.py) halved the *projection* output but
still round-tripped the (M, inner) gated activation. Here both matmuls run
back-to-back per row block with the gated activation resident in VMEM:

    grid (M/bm, inner/bn), inner 'arbitrary':
      a = x_i @ Wa_j + ba_j ; g = x_i @ Wg_j + bg_j      (bm, bn) f32
      acc_i += (a * gelu(g)).astype(bf16) @ W2_j          (bm, K)  f32 scratch
      at j = nj-1:  out_i = (acc_i + b2).astype(dtype) + r_i

HBM traffic becomes x + out + residual + (M/bm) re-reads of the weights —
for the b=16 64² site that is ~160 MB vs XLA's ~750 MB.

Reference semantics: GLIGEN/ldm/modules/attention.py:38-65 (GEGLU with exact
erf GELU, then nn.Linear); the residual is the `x = ff(norm3(x)) + x` add in
BasicTransformerBlock (attention.py:394-402). Backward = plain XLA dots via
custom_vjp (training path, where the fusion pathology was not observed).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul import _erf, _pick_block


def _ffn_kernel(x_ref, wa_ref, wg_ref, ba_ref, bg_ref, w2_ref, b2_ref, r_ref,
                o_ref, acc, *, nj: int):
    ji = pl.program_id(1)

    @pl.when(ji == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    x = x_ref[:]
    a = jax.lax.dot_general(x, wa_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x, wg_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a + ba_ref[:].astype(jnp.float32)
    g = g + bg_ref[:].astype(jnp.float32)
    # exact-erf GELU (torch F.gelu default); Mosaic has no erf primitive —
    # Abramowitz-Stegun 7.1.26 (|eps| <= 1.5e-7)
    h = a * (0.5 * g * (1.0 + _erf(g * (2.0 ** -0.5))))
    # down-proj operands in the activation dtype (halves MXU operand traffic;
    # matches XLA, which reads the HBM-materialized bf16 intermediate)
    acc[:] = acc[:] + jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ji == nj - 1)
    def _fin():
        y = (acc[:] + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)
        # residual added in the activation dtype, matching the call site's
        # `ff(...) + x` bf16 add
        o_ref[:] = y + r_ref[:]


def _ffn_ln_kernel(x_ref, wa_ref, wg_ref, ba_ref, bg_ref, w2_ref, b2_ref,
                   gm_ref, bt_ref, s_ref, o_ref, acc, xn, *, nj: int,
                   eps: float):
    """LN-folded variant: computes xn = LayerNorm(x) in-kernel (cached in
    VMEM scratch across the inner-dim grid), feeds the FF matmuls with it,
    and uses the raw x block as the residual — the BasicTransformerBlock's
    `ff(norm3(x)) + x` needs no separate LN op or residual stream. With the
    FF inside a custom call XLA can no longer fuse norm3 into the up-proj
    dot, so the fold recovers (and beats) what that fusion gave."""
    ji = pl.program_id(1)

    @pl.when(ji == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        xf = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y = y * gm_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
        xn[:] = y.astype(xn.dtype)

    x = xn[:]
    a = jax.lax.dot_general(x, wa_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x, wg_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a + ba_ref[:].astype(jnp.float32)
    g = g + bg_ref[:].astype(jnp.float32)
    h = a * (0.5 * g * (1.0 + _erf(g * (2.0 ** -0.5))))
    acc[:] = acc[:] + jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ji == nj - 1)
    def _fin():
        # s is the gated fusers' scale*tanh(alpha) (1.0 at the plain norm3
        # site): out = x + s * FF(LN(x))
        y = (acc[:] + b2_ref[:].astype(jnp.float32)) * s_ref[0, 0]
        o_ref[:] = y.astype(o_ref.dtype) + x_ref[:]


def _blocks(m: int, k: int, n: int, itemsize: int = 2):
    """Row/inner block sizes keeping x+acc+gated block+double-buffered weight
    streams within ~10 MB of VMEM; env-overridable for sweeps."""
    # The standalone UNet sweep tolerated larger blocks (bm=2048 at K=320,
    # bn=256 at K=1280) but inside the full PLMS scan program the compiler's
    # stack margins differ and those hit the 16 MB scoped-vmem limit (by
    # 16.5K and 732.5K respectively); these sizes leave >=1 MB of headroom
    bn_want = int(os.environ.get("LLT2I_FFN_BN", "0")) or \
        (512 if k <= 640 else (256 if k <= 1024 else 128))
    bm_want = int(os.environ.get("LLT2I_FFN_BM", "0")) or \
        (1024 if k <= 768 else 512)
    if itemsize > 2:
        # f32 activations/weights double the block bytes (the trainer's f32
        # preview program overflowed scoped vmem by 88.5K at the K=1280 site
        # with the bf16-sized blocks); halve the row block to compensate
        bm_want = max(256, bm_want // 2)
    return _pick_block(m, bm_want), _pick_block(n, bn_want)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ffn_call(x, wa, wg, ba, bg, w2, b2, r, interpret: bool):
    m, k = x.shape
    n = wa.shape[1]
    bm, bn = _blocks(m, k, n, x.dtype.itemsize)
    nj = n // bn
    colspec = lambda: pl.BlockSpec((1, bn), lambda i, j: (0, j),
                                   memory_space=pltpu.VMEM)
    rowspec = lambda: pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_kernel, nj=nj),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        grid=(m // bm, nj),
        in_specs=[
            rowspec(),                                       # x
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),           # Wa
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),           # Wg
            colspec(),                                       # ba
            colspec(),                                       # bg
            pl.BlockSpec((bn, k), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),           # W2
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),           # b2
            rowspec(),                                       # residual
        ],
        out_specs=rowspec(),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, wa, wg, ba.reshape(1, -1).astype(x.dtype),
      bg.reshape(1, -1).astype(x.dtype), w2,
      b2.reshape(1, -1).astype(x.dtype), r)


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def _ffn_ln_call(x, wa, wg, ba, bg, w2, b2, gamma, beta, s, eps: float,
                 interpret: bool):
    m, k = x.shape
    n = wa.shape[1]
    bm, bn = _blocks(m, k, n, x.dtype.itemsize)
    nj = n // bn
    colspec = lambda: pl.BlockSpec((1, bn), lambda i, j: (0, j),
                                   memory_space=pltpu.VMEM)
    kspec = lambda: pl.BlockSpec((1, k), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM)
    rowspec = lambda: pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_ln_kernel, nj=nj, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        grid=(m // bm, nj),
        in_specs=[
            rowspec(),                                       # x
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),           # Wa
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),           # Wg
            colspec(),                                       # ba
            colspec(),                                       # bg
            pl.BlockSpec((bn, k), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),           # W2
            kspec(),                                         # b2
            kspec(),                                         # gamma
            kspec(),                                         # beta
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),           # s
        ],
        out_specs=rowspec(),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32),
                        pltpu.VMEM((bm, k), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, wa, wg, ba.reshape(1, -1).astype(x.dtype),
      bg.reshape(1, -1).astype(x.dtype), w2,
      b2.reshape(1, -1).astype(x.dtype),
      gamma.reshape(1, -1), beta.reshape(1, -1),
      jnp.asarray(s, jnp.float32).reshape(1, 1))


def ffn_eligible(m: int, k: int, n: int, itemsize: int = 2) -> bool:
    bm, bn = _blocks(m, k, n, itemsize)
    return m >= 1024 and k >= 128 and n >= 256 and m % 8 == 0 \
        and bm >= 256 and bn >= 128


def _ffn_ref(x2, wa, wg, ba, bg, w2, b2, r):
    a = jnp.dot(x2, wa) + ba.astype(x2.dtype)
    g = jnp.dot(x2, wg) + bg.astype(x2.dtype)
    h = a * jax.nn.gelu(g, approximate=False)
    return (jnp.dot(h, w2) + b2.astype(x2.dtype)) + r


@jax.custom_vjp
def ffn_geglu_fused(x2, wa, wg, ba, bg, w2, b2, r):
    """(x2 @ Wa,g + b -> a*gelu(g)) @ W2 + b2 + r, fused. x2/r: (M, K)."""
    interpret = jax.default_backend() != "tpu"
    return _ffn_call(x2, wa, wg, ba, bg, w2, b2, r, interpret)


def _ffn_fwd(x2, wa, wg, ba, bg, w2, b2, r):
    return ffn_geglu_fused(x2, wa, wg, ba, bg, w2, b2, r), \
        (x2, wa, wg, ba, bg, w2, b2)


def _ffn_bwd(res, gy):
    x2, wa, wg, ba, bg, w2, b2 = res
    _, vjp = jax.vjp(lambda *a: _ffn_ref(*a, jnp.zeros_like(x2)),
                     x2, wa, wg, ba, bg, w2, b2)
    grads = vjp(gy)
    return grads + (gy,)


ffn_geglu_fused.defvjp(_ffn_fwd, _ffn_bwd)


_LN_EPS = 1e-5  # torch nn.LayerNorm default, used by every reference norm3


def _ffn_ln_ff(x2, wa, wg, ba, bg, w2, b2, gamma, beta):
    """GEGLU_FF(LayerNorm(x2)) without the residual."""
    xf = x2.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    xn = (xn * gamma.astype(jnp.float32)
          + beta.astype(jnp.float32)).astype(x2.dtype)
    a = jnp.dot(xn, wa) + ba.astype(xn.dtype)
    g = jnp.dot(xn, wg) + bg.astype(xn.dtype)
    h = a * jax.nn.gelu(g, approximate=False)
    return jnp.dot(h, w2) + b2.astype(xn.dtype)


def _ffn_ln_ref(x2, wa, wg, ba, bg, w2, b2, gamma, beta):
    return _ffn_ln_ff(x2, wa, wg, ba, bg, w2, b2, gamma, beta) + x2


@jax.custom_vjp
def ffn_ln_geglu_fused(x2, wa, wg, ba, bg, w2, b2, gamma, beta):
    """LayerNorm(x2) -> GEGLU FF -> + x2, all in one kernel (see
    _ffn_ln_kernel). gamma/beta: (K,) LN affine params."""
    interpret = jax.default_backend() != "tpu"
    return _ffn_ln_call(x2, wa, wg, ba, bg, w2, b2, gamma, beta, 1.0,
                        _LN_EPS, interpret)


def _ffn_ln_fwd(x2, wa, wg, ba, bg, w2, b2, gamma, beta):
    return ffn_ln_geglu_fused(x2, wa, wg, ba, bg, w2, b2, gamma, beta), \
        (x2, wa, wg, ba, bg, w2, b2, gamma, beta)


def _ffn_ln_bwd(res, gy):
    _, vjp = jax.vjp(lambda *a: _ffn_ln_ref(*a), *res)
    return vjp(gy)


ffn_ln_geglu_fused.defvjp(_ffn_ln_fwd, _ffn_ln_bwd)


def _ffn_ln_scaled_ref(x2, wa, wg, ba, bg, w2, b2, gamma, beta, s):
    y = _ffn_ln_ff(x2, wa, wg, ba, bg, w2, b2, gamma, beta)
    return x2 + (jnp.asarray(s, jnp.float32) * y.astype(jnp.float32)
                 ).astype(x2.dtype)


@jax.custom_vjp
def ffn_ln_geglu_scaled(x2, wa, wg, ba, bg, w2, b2, gamma, beta, s):
    """x2 + s * GEGLU_FF(LayerNorm(x2)) — the gated fusers'
    `x + scale*tanh(alpha_dense)*ff(norm2(x))` site (GLIGEN
    attention.py:206-234) as one kernel; s is a traced scalar."""
    interpret = jax.default_backend() != "tpu"
    return _ffn_ln_call(x2, wa, wg, ba, bg, w2, b2, gamma, beta, s,
                        _LN_EPS, interpret)


def _ffn_ln_s_fwd(*args):
    return ffn_ln_geglu_scaled(*args), args


def _ffn_ln_s_bwd(res, gy):
    _, vjp = jax.vjp(lambda *a: _ffn_ln_scaled_ref(*a), *res)
    return vjp(gy)


ffn_ln_geglu_scaled.defvjp(_ffn_ln_s_fwd, _ffn_ln_s_bwd)


# ---------------------------------------------------------------------------
# weight-only int8 variant (ops/quant.py): the weight blocks stream from HBM
# as int8 (half the bytes — the point of int8 mode) and dequantize in VMEM.
# Per-output-channel scales distribute over the contraction, so they apply
# POST-dot: dot(x, q*s) == dot(x, q) * s — one (bm, bn) multiply instead of a
# (k, bn) dequant, and the int8->bf16 convert feeds the MXU directly.
# Inference-only (no custom_vjp: training never runs int8). Opt-in via
# LLT2I_FFN_INT8=1 until the on-chip A/B (Mosaic has rejected
# interpreter-green kernels before — PERF.md).


def _ffn_ln_q_kernel(x_ref, qa_ref, qg_ref, sa_ref, sg_ref, ba_ref, bg_ref,
                     q2_ref, s2_ref, b2_ref, gm_ref, bt_ref, s_ref, o_ref,
                     acc, xn, *, nj: int, eps: float):
    ji = pl.program_id(1)

    @pl.when(ji == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        xf = x_ref[:].astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y = y * gm_ref[:].astype(jnp.float32) + bt_ref[:].astype(jnp.float32)
        xn[:] = y.astype(xn.dtype)

    x = xn[:]
    a = jax.lax.dot_general(x, qa_ref[:].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    g = jax.lax.dot_general(x, qg_ref[:].astype(x.dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    a = a * sa_ref[:] + ba_ref[:].astype(jnp.float32)
    g = g * sg_ref[:] + bg_ref[:].astype(jnp.float32)
    h = a * (0.5 * g * (1.0 + _erf(g * (2.0 ** -0.5))))
    acc[:] = acc[:] + jax.lax.dot_general(
        h.astype(x.dtype), q2_ref[:].astype(x.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ji == nj - 1)
    def _fin():
        y = acc[:] * s2_ref[:] + b2_ref[:].astype(jnp.float32)
        o_ref[:] = (y * s_ref[0, 0]).astype(o_ref.dtype) + x_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "eps"))
def _ffn_ln_q_call(x, qa, qg, sa, sg, ba, bg, q2, s2, b2, gamma, beta, s,
                   eps: float, interpret: bool):
    m, k = x.shape
    n = qa.shape[1]
    bm, bn = _blocks(m, k, n, x.dtype.itemsize)
    nj = n // bn
    colspec = lambda: pl.BlockSpec((1, bn), lambda i, j: (0, j),
                                   memory_space=pltpu.VMEM)
    kspec = lambda: pl.BlockSpec((1, k), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM)
    rowspec = lambda: pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ffn_ln_q_kernel, nj=nj, eps=eps),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        grid=(m // bm, nj),
        in_specs=[
            rowspec(),                                       # x
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),           # Qa int8
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),           # Qg int8
            colspec(),                                       # sa f32
            colspec(),                                       # sg f32
            colspec(),                                       # ba
            colspec(),                                       # bg
            pl.BlockSpec((bn, k), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),           # Q2 int8
            kspec(),                                         # s2 f32
            kspec(),                                         # b2
            kspec(),                                         # gamma
            kspec(),                                         # beta
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),           # s
        ],
        out_specs=rowspec(),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32),
                        pltpu.VMEM((bm, k), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, qa, qg,
      sa.reshape(1, -1).astype(jnp.float32),
      sg.reshape(1, -1).astype(jnp.float32),
      ba.reshape(1, -1).astype(x.dtype), bg.reshape(1, -1).astype(x.dtype),
      q2, s2.reshape(1, -1).astype(jnp.float32),
      b2.reshape(1, -1).astype(x.dtype),
      gamma.reshape(1, -1), beta.reshape(1, -1),
      jnp.asarray(s, jnp.float32).reshape(1, 1))


def ffn_ln_geglu_scaled_q(x2, qa, qg, sa, sg, ba, bg, q2, s2, b2,
                          gamma, beta, s):
    """x2 + s * GEGLU_FF(LayerNorm(x2)) with int8 weights (q*, per-output-
    channel scales s*) dequantized in VMEM. s=1.0 recovers the plain norm3
    site. Inference-only (no vjp)."""
    interpret = jax.default_backend() != "tpu"
    return _ffn_ln_q_call(x2, qa, qg, sa, sg, ba, bg, q2, s2, b2,
                          gamma, beta, s, _LN_EPS, interpret)


def _ffn_ln_q_ref(x2, qa, qg, sa, sg, ba, bg, q2, s2, b2, gamma, beta, s):
    """XLA reference mirroring the kernel's math (post-dot scales)."""
    xf = x2.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    xn = (xn * gamma.astype(jnp.float32)
          + beta.astype(jnp.float32)).astype(x2.dtype)
    a = jnp.dot(xn, qa.astype(xn.dtype)).astype(jnp.float32) * sa \
        + ba.astype(jnp.float32)
    g = jnp.dot(xn, qg.astype(xn.dtype)).astype(jnp.float32) * sg \
        + bg.astype(jnp.float32)
    h = (a * jax.nn.gelu(g, approximate=False)).astype(x2.dtype)
    y = jnp.dot(h, q2.astype(h.dtype)).astype(jnp.float32) * s2 \
        + b2.astype(jnp.float32)
    return x2 + (jnp.asarray(s, jnp.float32) * y).astype(x2.dtype)
