"""Blocked Pallas TPU GEMM with fused bias / GEGLU / residual epilogues.

Motivation (PERF.md round 2): XLA's TPU layout assignment around the Pallas
attention/norm custom-calls drove the UNet's FF and projection dot_generals
into token-minor layouts and batch-in-lanes emitters measured at ~5-20% MFU
(nn.py:39 totalled 48.8 ms of a 246 ms b=16 forward). A plain blocked GEMM
keeps default row-major layouts at its boundary (which also removes the
{1,2,0}<->{2,0,1} copies XLA inserted) and runs the MXU at normal utilization.

Layout: x (M, K) @ w (K, N) -> (M, N); grid (M/bm, N/bn, K/bk) with the K
dimension 'arbitrary' and an f32 accumulator in VMEM scratch. The epilogue
(bias add, exact-erf GEGLU gating, residual add, dtype cast) runs at the
last K block.

The GEGLU variant computes BOTH halves of the reference FeedForward's
net.0.proj in one kernel — a: x@Wa, gate: x@Wg, out = a * gelu(gate) —
halving HBM output traffic vs materializing the (..., 2*inner) projection
(GLIGEN attention.py:38-65 semantics, erf GELU).

Backward passes use plain XLA dots (see custom VJPs at the bottom): the
backward matmuls are the same shapes transposed and XLA handles them on the
training path where these layout pathologies were not observed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(dim: int, want: int) -> int:
    """Largest power-of-two block <= want that divides dim (dim itself if
    smaller than want)."""
    if dim <= want:
        return dim
    b = want
    while dim % b:
        b //= 2
    return b


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs error 1.5e-7), built
    from primitives Mosaic lowers (exp); odd-reflected for x < 0."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _mm_kernel(x_ref, w_ref, b_ref, r_ref, o_ref, acc, *, nk: int,
               has_bias: bool, has_res: bool):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] = acc[:] + jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _fin():
        y = acc[:]
        if has_bias:
            y = y + b_ref[:].astype(jnp.float32)
        if has_res:
            y = y + r_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


def _geglu_kernel(x_ref, wa_ref, wg_ref, ba_ref, bg_ref, o_ref, acc_a, acc_g,
                  *, nk: int, has_bias: bool):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_a[:] = jnp.zeros_like(acc_a)
        acc_g[:] = jnp.zeros_like(acc_g)

    x = x_ref[:]
    acc_a[:] = acc_a[:] + jax.lax.dot_general(
        x, wa_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_g[:] = acc_g[:] + jax.lax.dot_general(
        x, wg_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _fin():
        a = acc_a[:]
        g = acc_g[:]
        if has_bias:
            a = a + ba_ref[:].astype(jnp.float32)
            g = g + bg_ref[:].astype(jnp.float32)
        # exact-erf GELU (torch F.gelu default, GLIGEN attention.py:43-45);
        # Mosaic has no erf primitive, so use Abramowitz-Stegun 7.1.26
        # (|eps| <= 1.5e-7 — orders below bf16 activation resolution)
        gelu = 0.5 * g * (1.0 + _erf(g * (2.0 ** -0.5)))
        o_ref[:] = (a * gelu).astype(o_ref.dtype)


_BM, _BN, _BK = 512, 512, 512


@functools.partial(jax.jit,
                   static_argnames=("interpret", "has_bias", "has_res"))
def _mm_call(x, w, b, r, interpret: bool, has_bias: bool, has_res: bool):
    m, k = x.shape
    n = w.shape[1]
    bm = _pick_block(m, _BM)
    bn = _pick_block(n, _BN)
    bk = _pick_block(k, _BK)
    nk = k // bk
    bspec = (pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                          memory_space=pltpu.VMEM)
             if has_bias else
             pl.BlockSpec((1, 1), lambda i, j, kk: (0, 0),
                          memory_space=pltpu.VMEM))
    rspec = (pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                          memory_space=pltpu.VMEM)
             if has_res else
             pl.BlockSpec((1, 1), lambda i, j, kk: (0, 0),
                          memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_mm_kernel, nk=nk, has_bias=has_bias,
                          has_res=has_res),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            bspec,
            rspec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w, b, r)


@functools.partial(jax.jit, static_argnames=("interpret", "has_bias"))
def _geglu_call(x, wa, wg, ba, bg, interpret: bool, has_bias: bool):
    m, k = x.shape
    n = wa.shape[1]
    bm = _pick_block(m, _BM)
    bn = _pick_block(n, _BN)
    bk = _pick_block(k, _BK)
    nk = k // bk
    bspec = (pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                          memory_space=pltpu.VMEM)
             if has_bias else
             pl.BlockSpec((1, 1), lambda i, j, kk: (0, 0),
                          memory_space=pltpu.VMEM))
    wspec = pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_geglu_kernel, nk=nk, has_bias=has_bias),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=(m // bm, n // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            wspec,
            wspec,
            bspec,
            bspec,
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                        pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, wa, wg, ba, bg)


def _eligible(m: int, k: int, n: int) -> bool:
    """Worth routing to the kernel: big enough to matter, block-decomposable.
    _pick_block always succeeds for power-of-two-ish dims; require the dims
    to decompose into blocks of at least 8x128 tiles."""
    return (
        m >= 1024 and k >= 128 and n >= 128
        and m % 8 == 0
        and _pick_block(m, _BM) >= 256
        and _pick_block(k, _BK) >= 128
        and _pick_block(n, _BN) >= 128
    )


def _dummy(dtype):
    return jnp.zeros((1, 1), dtype)


# ---------------------------------------------------------------------------
# public, differentiable entry points (backward = plain XLA dots)


@jax.custom_vjp
def linear_fused(x2, w, b):
    """(M, K) @ (K, N) + b with row-major boundary layouts. b may be None."""
    interpret = jax.default_backend() != "tpu"
    if b is None:
        return _mm_call(x2, w, _dummy(x2.dtype), _dummy(x2.dtype), interpret,
                        False, False)
    return _mm_call(x2, w, b.reshape(1, -1).astype(x2.dtype),
                    _dummy(x2.dtype), interpret, True, False)


def _linear_fwd(x2, w, b):
    return linear_fused(x2, w, b), (x2, w, b is not None)


def _linear_bwd(res, g):
    x2, w, has_b = res
    gf = g.astype(jnp.float32)
    dx = jnp.dot(g, w.T.astype(g.dtype))
    dw = jnp.dot(x2.T.astype(jnp.float32), gf).astype(w.dtype)
    db = jnp.sum(gf, axis=0).astype(g.dtype) if has_b else None
    return dx, dw, db


linear_fused.defvjp(_linear_fwd, _linear_bwd)


@jax.custom_vjp
def geglu_fused(x2, wa, wg, ba, bg):
    """a * gelu_exact(gate) with a = x@wa+ba, gate = x@wg+bg. (M,K)->(M,N)."""
    interpret = jax.default_backend() != "tpu"
    if ba is None:
        return _geglu_call(x2, wa, wg, _dummy(x2.dtype), _dummy(x2.dtype),
                           interpret, False)
    return _geglu_call(x2, wa, wg, ba.reshape(1, -1).astype(x2.dtype),
                       bg.reshape(1, -1).astype(x2.dtype), interpret, True)


def _geglu_ref(x2, wa, wg, ba, bg):
    a = jnp.dot(x2, wa)
    g = jnp.dot(x2, wg)
    if ba is not None:
        a = a + ba.astype(a.dtype)
        g = g + bg.astype(g.dtype)
    return a * jax.nn.gelu(g, approximate=False)


def _geglu_fwd(x2, wa, wg, ba, bg):
    return geglu_fused(x2, wa, wg, ba, bg), (x2, wa, wg, ba, bg)


def _geglu_bwd(res, g):
    x2, wa, wg, ba, bg = res
    _, vjp = jax.vjp(lambda *a: _geglu_ref(*a), x2, wa, wg, ba, bg)
    return vjp(g)


geglu_fused.defvjp(_geglu_fwd, _geglu_bwd)
