"""Pallas TPU flash attention (forward, non-causal).

Used for the UNet's spatial self/gated self-attention where N is up to 4096
latent tokens (+30 grounding tokens) and materializing the (N x N) score
matrix per head is HBM-bandwidth bound. Online-softmax over key blocks keeps
everything in VMEM; scores/accumulation are float32, inputs may be bfloat16.

Head dims in SD-1.x are 40/80/160, so q/k/v are zero-padded to a 128-lane
multiple (zero features don't change dot products); padded key rows are
masked to -inf before the softmax, padded query rows are sliced away.
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


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, C)
    block_q, cp = q.shape
    mp = k_ref.shape[1]
    num_kb = mp // block_k

    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, cp), dtype=jnp.float32)

    def body(j, carry):
        m_i, l_i, acc = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m_i, l_i, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / l_i).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "kv_len", "interpret")
)
def _flash_bh(q, k, v, scale: float, block_q: int, block_k: int, kv_len: int,
              interpret: bool):
    """q: (BH, Np, Cp), k/v: (BH, Mp, Cp) — padded; kv_len is the true M."""
    bh, np_, cp = q.shape
    mp = k.shape[1]
    grid = (bh, np_ // block_q)
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, kv_len=kv_len, scale=scale
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, np_, cp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, cp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, cp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mp, cp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, cp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
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

    cp = _round_up(max(c, 128), 128)
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(m, 128))
    np_ = _round_up(n, block_q)
    mp = _round_up(m, block_k)

    def pad_to(x, rows, cols):
        return jnp.pad(x, ((0, 0), (0, rows - x.shape[1]), (0, cols - x.shape[2])))

    qf = pad_to(q.reshape(b * h, n, c), np_, cp)
    kf = pad_to(k.reshape(b * h, m, c), mp, cp)
    vf = pad_to(v.reshape(b * h, m, c), mp, cp)
    # kv_len for masking is the true m; padded key rows get -inf scores.
    out = _flash_bh(qf, kf, vf, scale, block_q, block_k, m, interpret)
    return out[:, :n, :c].reshape(b, h, n, c)
