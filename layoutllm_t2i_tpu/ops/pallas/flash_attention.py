"""Pallas TPU flash attention (forward, non-causal).

Used for the UNet's spatial self/gated self-attention (up to 4096+30 tokens,
head dim 40-160) and the VAE's single-head 4096x512 attention. Online softmax
over a 3-D grid (batch*heads, q-blocks, k-blocks): K/V stream through VMEM
one block at a time (holding full K/V resident OOMs the 16MB VMEM at
4096x512), with the running max/denominator/accumulator in VMEM scratch that
persists across the sequential k dimension. Scores/accumulation are float32;
inputs may be bfloat16.

Head dims are zero-padded to a 128-lane multiple (zero features don't change
dot products); padded key rows are masked to -inf, padded query rows sliced
away.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                  block_k: int, kv_len: int, scale: float, num_kb: int):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)  # (BQ, C)
    k = k_ref[0]                                      # (BK, C)
    v = v_ref[0]
    block_q = q.shape[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, BK)
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    # PV matmul in the input dtype (bf16): halves the MXU operand traffic;
    # the accumulator stays f32 via preferred_element_type
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v.astype(v_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == num_kb - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_kernel_fullkv(q_ref, k_ref, v_ref, o_ref, *, block_k: int,
                         kv_len: int, scale: float):
    """Single-program variant: full K/V resident in VMEM, fori over k-blocks.
    Faster than the streaming grid when K/V fit (fewer grid iterations, no
    scratch round-trips); the wrapper picks it by VMEM footprint."""
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    block_q, cp = q.shape
    mp = k_ref.shape[1]
    num_kb = mp // block_k

    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, cp), dtype=jnp.float32)

    def body(j, carry):
        m_i, l_i, acc = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v.astype(v_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m_i, l_i, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l_i).astype(o_ref.dtype)


# keep total VMEM well under the 16MB budget (K+V resident, double-buffered
# q/out blocks, f32 accumulator)
_FULLKV_VMEM_BYTES = 4 * 1024 * 1024


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "kv_len", "interpret")
)
def _flash_bh(q, k, v, scale: float, block_q: int, block_k: int, kv_len: int,
              interpret: bool):
    """q: (BH, Np, Cp), k/v: (BH, Mp, Cp) — padded; kv_len is the true M."""
    bh, np_, cp = q.shape
    mp = k.shape[1]
    num_kb = mp // block_k
    kv_bytes = 2 * mp * cp * q.dtype.itemsize

    if kv_bytes <= _FULLKV_VMEM_BYTES:
        kernel = functools.partial(
            _flash_kernel_fullkv, block_k=block_k, kv_len=kv_len, scale=scale
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bh, np_, cp), q.dtype),
            grid=(bh, np_ // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, cp), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mp, cp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mp, cp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, cp), lambda b, i: (b, i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(q, k, v)

    grid = (bh, np_ // block_q, num_kb)
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, kv_len=kv_len, scale=scale, num_kb=num_kb
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, np_, cp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, cp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, cp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, cp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, cp), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, 128), jnp.float32),   # running denom
            pltpu.VMEM((block_q, cp), jnp.float32),    # accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention(q, k, v, scale: float, block_q: int = 256, block_k: int = 512,
                    interpret: bool | None = None):
    """q: (B, H, N, C), k/v: (B, H, M, C) -> (B, H, N, C)."""
    b, h, n, c = q.shape
    m = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # No column padding: Mosaic pads sub-128 minor dims inside VMEM tiles for
    # free, while an explicit jnp.pad materializes 128/c-times the HBM
    # traffic (for SD's d_head=40 that tripled attention bandwidth).
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(m, 128))
    np_ = _round_up(n, block_q)
    mp = _round_up(m, block_k)

    def pad_rows(x, rows):
        if rows == x.shape[1]:
            return x
        return jnp.pad(x, ((0, 0), (0, rows - x.shape[1]), (0, 0)))

    qf = pad_rows(q.reshape(b * h, n, c), np_)
    kf = pad_rows(k.reshape(b * h, m, c), mp)
    vf = pad_rows(v.reshape(b * h, m, c), mp)
    # kv_len for masking is the true m; padded key rows get -inf scores.
    out = _flash_bh(qf, kf, vf, scale, block_q, block_k, m, interpret)
    return out[:, :n, :].reshape(b, h, n, c)
