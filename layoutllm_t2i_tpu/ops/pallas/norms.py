"""Fused one-pass GroupNorm(+SiLU) and LayerNorm Pallas TPU kernels.

Motivation (PERF.md round-1 trace): the XLA lowering of GroupNorm32-style
norms (float32 statistics over a bf16 tensor, GLIGEN util.py:226-228) costs
two full reads of the activation per norm (convert+reduce pass, then a
normalize pass) plus a separately materialized SiLU output before each conv.
These kernels read the activation from HBM once, compute f32 statistics
on-chip, and write the normalized (optionally SiLU'd) result once —
~15% of the round-1 UNet step was this convert/reduce traffic.

Shapes are blocked per batch sample (GroupNorm) or per row-chunk
(LayerNorm); statistics never leave VMEM. Group sums are computed with tiny
one-hot matmuls ((1,C)x(C,G)) instead of lane-splitting reshapes, which
Mosaic handles poorly.

Both kernels carry a ``jax.custom_vjp`` whose backward recomputes the norm
in plain XLA math — training differentiates through them without a
hand-written backward kernel (the backward is bandwidth-bound either way).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-block VMEM budget for the activation tile. Mosaic double-buffers the
# input AND output blocks (4x the block bytes resident), so the ceiling for a
# single block is ~16MB/4 minus the f32 row-tile temporaries; wide-channel
# sites split along the GROUP axis instead (stats are per-group, so group
# chunks are fully independent — the one-pass property is preserved).
_GN_BLOCK_BYTES = int(3.25 * 1024 * 1024)
_ROW_TILE = 512  # HW rows processed per inner iteration


def _gn_group_chunks(hw: int, c: int, num_groups: int, itemsize: int):
    """Smallest k (dividing num_groups) whose (1, HW, C/k) block fits the
    budget; None if no legal split exists (-> XLA fallback).

    Mosaic constraint: a block that PARTITIONS the channel dim must have
    C/k % 128 == 0 (k == 1 keeps the full dim and is exempt); lane padding
    to 128 counts against the budget either way."""
    for k in range(1, num_groups + 1):
        if num_groups % k or c % k:
            continue
        ck = c // k
        if k > 1 and ck % 128:
            continue
        ck_padded = -(-ck // 128) * 128
        if hw * ck_padded * itemsize <= _GN_BLOCK_BYTES:
            return k
    return None


def _gn_kernel(x_ref, g_ref, b_ref, o_ref, *, num_groups: int, eps: float,
               silu: bool, row_tile: int):
    """x_ref: (1, HW, C/k) — one (batch sample, group chunk) per program;
    num_groups is the group count WITHIN the chunk."""
    hw, c = x_ref.shape[1], x_ref.shape[2]
    cg = c // num_groups
    n_tiles = hw // row_tile

    # one-hot (C, G) group map; tiny constants the compiler folds
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    group_of = (ch // cg == gr).astype(jnp.float32)          # (C, G)

    def stat_body(i, carry):
        s, ss = carry
        x = x_ref[0, pl.ds(i * row_tile, row_tile), :].astype(jnp.float32)
        return s + jnp.sum(x, axis=0, keepdims=True), \
               ss + jnp.sum(x * x, axis=0, keepdims=True)

    zero = jnp.zeros((1, c), jnp.float32)
    s, ss = jax.lax.fori_loop(0, n_tiles, stat_body, (zero, zero))

    gsum = jnp.dot(s, group_of, preferred_element_type=jnp.float32)   # (1, G)
    gsq = jnp.dot(ss, group_of, preferred_element_type=jnp.float32)
    cnt = float(hw * cg)
    mean_g = gsum / cnt
    var_g = gsq / cnt - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    # broadcast group stats back to channels: (1,G) x (G,C)
    mean_c = jnp.dot(mean_g, group_of.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_g, group_of.T, preferred_element_type=jnp.float32)

    gamma = g_ref[:].astype(jnp.float32).reshape(1, c)
    beta = b_ref[:].astype(jnp.float32).reshape(1, c)
    scale = gamma * rstd_c
    shift = beta - mean_c * scale

    def norm_body(i, _):
        x = x_ref[0, pl.ds(i * row_tile, row_tile), :].astype(jnp.float32)
        y = x * scale + shift
        if silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0, pl.ds(i * row_tile, row_tile), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, norm_body, 0)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "silu",
                                             "interpret", "k"))
def _gn_pallas(x, gamma, beta, num_groups: int, eps: float, silu: bool,
               interpret: bool, k: int = 1):
    n, h, w, c = x.shape
    hw = h * w
    row_tile = min(_ROW_TILE, hw)
    while hw % row_tile:
        row_tile //= 2
    xr = x.reshape(n, hw, c)
    ck = c // k
    kernel = functools.partial(_gn_kernel, num_groups=num_groups // k, eps=eps,
                               silu=silu, row_tile=row_tile)
    # params as (1, C) 2-D: Mosaic rejects blocked 1-D bf16 operands (tiled
    # layout mismatch when the channel dim is split)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n, k),
        in_specs=[
            pl.BlockSpec((1, hw, ck), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ck), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ck), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, ck), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xr, gamma.reshape(1, c), beta.reshape(1, c))
    return out.reshape(n, h, w, c)


def _gn_stats_kernel(x_ref, g_ref, b_ref, o_ref, s_scr, ss_scr, *,
                     num_groups: int, eps: float, hw: int):
    """Pass 1 of the rows-streaming GroupNorm: accumulate channel sums over
    row blocks (grid dim 1 is 'arbitrary'), finalize per-channel scale/shift
    at the last block. o_ref: (1, 2, C) f32 — [0]=scale, [1]=shift."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        s_scr[:] = jnp.zeros_like(s_scr)
        ss_scr[:] = jnp.zeros_like(ss_scr)

    x = x_ref[0].astype(jnp.float32)                        # (rb, C)
    s_scr[:] = s_scr[:] + jnp.sum(x, axis=0, keepdims=True)
    ss_scr[:] = ss_scr[:] + jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(j == nj - 1)
    def _finish():
        c = x_ref.shape[2]
        cg = c // num_groups
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0)
        gr = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
        group_of = (ch // cg == gr).astype(jnp.float32)      # (C, G)
        gsum = jnp.dot(s_scr[:], group_of, preferred_element_type=jnp.float32)
        gsq = jnp.dot(ss_scr[:], group_of, preferred_element_type=jnp.float32)
        cnt = float(hw * cg)
        mean_g = gsum / cnt
        var_g = gsq / cnt - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mean_c = jnp.dot(mean_g, group_of.T, preferred_element_type=jnp.float32)
        rstd_c = jnp.dot(rstd_g, group_of.T, preferred_element_type=jnp.float32)
        gamma = g_ref[:].astype(jnp.float32).reshape(1, c)
        beta = b_ref[:].astype(jnp.float32).reshape(1, c)
        scale = gamma * rstd_c
        o_ref[0, :1] = scale
        o_ref[0, 1:] = beta - mean_c * scale


def _gn_apply_kernel(x_ref, st_ref, o_ref, *, silu: bool):
    x = x_ref[0].astype(jnp.float32)
    y = x * st_ref[0, :1] + st_ref[0, 1:]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


# per-row-block VMEM budget for the streaming variant (input only; stats are
# (2, C) and negligible)
_GN_ROWS_BLOCK_BYTES = 2 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "silu",
                                             "interpret", "rb"))
def _gn_pallas_rows(x, gamma, beta, num_groups: int, eps: float, silu: bool,
                    interpret: bool, rb: int):
    """Two-pass streaming GroupNorm for shapes whose (1, HW, C) block exceeds
    VMEM: grid over row blocks, f32 channel sums carried in scratch. Reads x
    twice + writes once (~3x HBM traffic) — the XLA fallback's convert/reduce
    lowering measured ~10x slower than that bound on (8,4096,640) bf16."""
    n, h, w, c = x.shape
    hw = h * w
    xr = x.reshape(n, hw, c)
    stats = pl.pallas_call(
        functools.partial(_gn_stats_kernel, num_groups=num_groups, eps=eps,
                          hw=hw),
        out_shape=jax.ShapeDtypeStruct((n, 2, c), jnp.float32),
        grid=(n, hw // rb),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xr, gamma.reshape(1, c), beta.reshape(1, c))
    out = pl.pallas_call(
        functools.partial(_gn_apply_kernel, silu=silu),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        grid=(n, hw // rb),
        in_specs=[
            pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xr, stats)
    return out.reshape(n, h, w, c)


def _gn_rows_block(hw: int, c: int, itemsize: int):
    """Largest row block (multiple of 8, dividing hw) within the budget."""
    cp = -(-c // 128) * 128
    rb = max(8, min(hw, _GN_ROWS_BLOCK_BYTES // (cp * itemsize)))
    rb -= rb % 8
    while rb >= 8 and hw % rb:
        rb -= 8
    return rb if rb >= 8 and hw % rb == 0 else None


def _gn_reference(x, gamma, beta, num_groups: int, eps: float, silu: bool):
    """Plain-XLA math (identical to ops.nn.group_norm), used as fallback and
    as the recompute inside the custom backward."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    y = xf * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_silu(x, gamma, beta, num_groups: int = 32, eps: float = 1e-5,
                    silu: bool = False):
    """Fused GroupNorm(+SiLU) over NHWC with f32 statistics.

    LLT2I_DISABLE_FUSED_GN=1 keeps GroupNorm on the XLA path while leaving
    the LayerNorm kernel on: the GN custom call pins a standard layout on a
    conv-adjacent activation, and the HLO shows XLA paying {3,0,2,1} <->
    {3,2,1,0} copy pairs at those boundaries — this knob isolates whether
    the one-pass kernel still wins end-to-end after those copies."""
    import os

    if os.environ.get("LLT2I_DISABLE_FUSED_GN", "0") == "1":
        return _gn_reference(x, gamma, beta, num_groups, eps, silu)
    interpret = jax.default_backend() != "tpu"
    n, h, w, c = x.shape
    k = (_gn_group_chunks(h * w, c, num_groups, x.dtype.itemsize)
         if (h * w) % 8 == 0 and c % num_groups == 0 else None)
    if k is not None:
        return _gn_pallas(x, gamma, beta, num_groups, eps, silu, interpret, k)
    rb = (_gn_rows_block(h * w, c, x.dtype.itemsize)
          if c % num_groups == 0 else None)
    if rb is not None:
        return _gn_pallas_rows(x, gamma, beta, num_groups, eps, silu,
                               interpret, rb)
    return _gn_reference(x, gamma, beta, num_groups, eps, silu)


def _gn_fwd(x, gamma, beta, num_groups, eps, silu):
    return group_norm_silu(x, gamma, beta, num_groups, eps, silu), (x, gamma, beta)


def _gn_bwd(num_groups, eps, silu, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda xx, gg, bb: _gn_reference(xx, gg, bb, num_groups, eps, silu),
        x, gamma, beta)
    return vjp(g)


group_norm_silu.defvjp(_gn_fwd, _gn_bwd)


# ---------------------------------------------------------------------------
# LayerNorm


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)                        # (rows, C)
    c = x.shape[1]
    mean = jnp.mean(x, axis=1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * g_ref[:].astype(jnp.float32).reshape(1, c) \
        + b_ref[:].astype(jnp.float32).reshape(1, c)
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_pallas(x2, gamma, beta, eps: float, interpret: bool):
    rows, c = x2.shape
    # C is a FULL (unpartitioned) block dim, so it is exempt from the
    # 128-multiple rule; lane padding to ceil(c/128)*128 only costs VMEM
    cp = -(-c // 128) * 128
    cap = max(8, (2 << 20) // (cp * x2.dtype.itemsize))
    block = min(1024, rows, 1 << (cap.bit_length() - 1))  # power-of-two cap
    while block >= 8 and rows % block:
        block //= 2
    if block < 8 or rows % block:
        return _ln_reference(x2, gamma, beta, eps)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, c), x2.dtype),
        grid=(rows // block,),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (1, C) params
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, gamma.reshape(1, c), beta.reshape(1, c))


def _ln_reference(x, gamma, beta, eps: float):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = xf * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_fused(x, gamma, beta, eps: float = 1e-5):
    """Fused LayerNorm over the last axis with f32 statistics."""
    c = x.shape[-1]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if jax.default_backend() != "tpu" and rows * c > (1 << 22):
        # interpret mode on huge inputs is slow in tests; use XLA math
        return _ln_reference(x, gamma, beta, eps)
    # The c % 128 gate is a MEASURED choice, not a Mosaic requirement
    # (full-dim blocks are exempt from the lane rule, see _ln_pallas):
    # routing the c=320 transformer LayerNorms to the kernel removed 9.5 ms
    # of XLA convert/reduce stats but COST ~7 ms more overall — XLA had been
    # fusing the normalize into the neighboring dots for free, and those
    # fusions degraded (b=16 trace: 246.4 -> 253.4 ms; PERF.md round 2).
    if c % 128 != 0 or rows % 8 != 0:
        return _ln_reference(x, gamma, beta, eps)
    interpret = jax.default_backend() != "tpu"
    out = _ln_pallas(x.reshape(rows, c), gamma, beta, eps, interpret)
    return out.reshape(x.shape)


def _ln_fwd(x, gamma, beta, eps):
    return layer_norm_fused(x, gamma, beta, eps), (x, gamma, beta)


def _ln_bwd(eps, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(lambda xx, gg, bb: _ln_reference(xx, gg, bb, eps),
                     x, gamma, beta)
    return vjp(g)


layer_norm_fused.defvjp(_ln_fwd, _ln_bwd)
