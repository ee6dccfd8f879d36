"""Pallas TPU flash attention (forward + custom-VJP backward, non-causal).

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

The backward is the standard recompute-softmax flash backward: the forward
rule additionally emits the per-row log-sum-exp; dQ streams K/V blocks per
query block, dK/dV streams Q/dO blocks per key block, with f32 accumulators
in VMEM scratch. Padded dO rows are zero so padding contributes nothing;
padded dK/dV rows are sliced away. This makes the training step
(train_step.py) differentiable through the Pallas path instead of falling
back to XLA attention (the reference trains through its attention,
trainer_combined_layout.py:414-416).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# exp_impl selects the softmax exponential flavor (env LLT2I_FLASH_EXP):
#   'exp'  — f32 jnp.exp (the reference-faithful baseline);
#   'exp2' — base-2 domain: log2(e) folds into the q scale and the kernel
#            runs hardware exp2 instead of exp (one fewer VPU multiply per
#            score element — exp lowers to exp2(x*log2e) anyway);
#   'bf16' — exp2 with the (s - m) operand cast to bf16 first: attention at
#            d_head=40 is VPU-bound, and the bf16 exp2 + bf16 p output halve
#            the exp/convert traffic. Costs ~2^-9 relative error on softmax
#            weights (below the bf16 output quantization of the PV matmul).
# The running max/denominator stay f32 in every mode. When exp2 is in play,
# the emitted lse is in BASE-2 (m2 + log2(l)); forward and backward always
# run the same impl so the domain is consistent.


def _exp_cfg(exp_impl: str):
    use2 = exp_impl in ("exp2", "bf16")
    expf = jnp.exp2 if use2 else jnp.exp
    logf = jnp.log2 if use2 else jnp.log
    qmul = _LOG2E if use2 else 1.0
    pdt = jnp.bfloat16 if exp_impl == "bf16" else None
    return expf, logf, qmul, pdt


def _lse_row(m_col, l_col, logf=jnp.log):
    """(BQ, 1) running max/denominator -> (1, BQ) log-sum-exp row."""
    return jnp.transpose(m_col + logf(l_col), (1, 0))


# The softmax denominator rides in the PV matmul: V carries an appended ones
# column, so the row-sum of p lands in the accumulator's last column as MXU
# work instead of a VPU reduction over every score element. acc layout is
# therefore (BQ, Cv+1) with acc[:, -1] == l.


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, acc_scr, *,
                  block_k: int, kv_len: int, scale: float, num_kb: int,
                  need_lse: bool, need_mask: bool, exp_impl: str):
    expf, logf, qmul, pdt = _exp_cfg(exp_impl)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = (q_ref[0].astype(jnp.float32) * (scale * qmul)).astype(q_ref.dtype)
    k = k_ref[0]                                      # (BK, C)
    v = v_ref[0]                                      # (BK, Cv+1), ones col

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (BQ, BK)
    if need_mask:  # skipped statically when M needs no row padding
        col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    d = s - m_new
    p = expf(d.astype(pdt)) if pdt is not None else expf(d)
    alpha = expf(m_prev - m_new)
    # PV matmul in the input dtype (bf16): halves the MXU operand traffic;
    # the accumulator stays f32 via preferred_element_type
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v.astype(v_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == num_kb - 1)
    def _finish():
        acc = acc_scr[:]
        o_ref[0] = (acc[:, :-1] / acc[:, -1:]).astype(o_ref.dtype)
        if need_lse:
            lse_ref[0] = _lse_row(m_scr[:, :1], acc[:, -1:], logf)


def _flash_kernel_fullkv(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
                         kv_len: int, scale: float, need_lse: bool,
                         need_mask: bool, exp_impl: str):
    """Single-program variant: full K/V resident in VMEM, fori over k-blocks.
    Faster than the streaming grid when K/V fit (fewer grid iterations, no
    scratch round-trips); the wrapper picks it by VMEM footprint.

    KV row padding is always < block_k (mp = round_up(m, block_k)), so only
    the LAST k block can contain padded rows: that iteration is peeled out
    of the loop and is the only one paying the iota+select mask pass."""
    expf, logf, qmul, pdt = _exp_cfg(exp_impl)
    q = (q_ref[0].astype(jnp.float32) * (scale * qmul)).astype(q_ref.dtype)
    block_q, cp = q.shape
    mp = k_ref.shape[1]
    cv1 = v_ref.shape[2]
    num_kb = mp // block_k

    m0 = jnp.full((block_q, 1), _NEG_INF, dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, cv1), dtype=jnp.float32)

    def step(j, m_i, acc, masked: bool):
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if masked:
            col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        d = s - m_new
        p = expf(d.astype(pdt)) if pdt is not None else expf(d)
        alpha = expf(m_i - m_new)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_ref.dtype), v.astype(v_ref.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, acc_new

    n_unmasked = num_kb - 1 if need_mask else num_kb
    m_i, acc = jax.lax.fori_loop(
        0, n_unmasked,
        lambda j, c: step(j, c[0], c[1], False), (m0, acc0))
    if need_mask:
        m_i, acc = step(num_kb - 1, m_i, acc, True)
    o_ref[0] = (acc[:, :-1] / acc[:, -1:]).astype(o_ref.dtype)
    if need_lse:
        lse_ref[0] = _lse_row(m_i, acc[:, -1:], logf)


def _attn_kernel_wholerow(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                          kv_len: int, scale: float, need_lse: bool,
                          need_mask: bool, exp_impl: str):
    """Whole-row softmax: K/V resident AND the full (BQ, Mp) score row held
    in VMEM — one QK dot, one row max, one exp pass, one PV dot. Removes the
    online-softmax machinery entirely (no per-block rescale, no loop-carried
    (m, acc) dependency serializing MXU behind VPU), which the block sweep
    showed was the fullkv loop's real overhead (exp flavor: no effect;
    PERF.md round 3). Used when block_q*Mp*4B fits the VMEM budget."""
    expf, logf, qmul, pdt = _exp_cfg(exp_impl)
    q = (q_ref[0].astype(jnp.float32) * (scale * qmul)).astype(q_ref.dtype)
    k = k_ref[0]                                       # (Mp, C)
    v = v_ref[0]                                       # (Mp, Cv+1), ones col

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (BQ, Mp)
    if need_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    d = s - m
    p = expf(d.astype(pdt)) if pdt is not None else expf(d)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (BQ, Cv+1)
    o_ref[0] = (acc[:, :-1] / acc[:, -1:]).astype(o_ref.dtype)
    if need_lse:
        lse_ref[0] = _lse_row(m, acc[:, -1:], logf)


def _attn_kernel_wholerow_hb(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                             kv_len: int, scale: float, need_lse: bool,
                             need_mask: bool, exp_impl: str):
    """Head-blocked whole-row variant: hb heads per grid program via batched
    dots. Same math as _attn_kernel_wholerow; the candidate win is
    grid-level (VERDICT r3 item 6) — 1/hb as many programs amortizes
    per-program launch/DMA setup, and the (hb, Mp, C) K/V block is one
    contiguous HBM region instead of hb separate fetches. The d_head=40 MXU
    ceiling is untouched (the batched dot is still hb independent
    contraction-40 matmuls). VMEM cost scales by hb, so the wrapper shrinks
    block_q to keep hb*block_q*Mp*4B inside the score budget."""
    expf, logf, qmul, pdt = _exp_cfg(exp_impl)
    q = (q_ref[:].astype(jnp.float32) * (scale * qmul)).astype(q_ref.dtype)
    k = k_ref[:]                                       # (hb, Mp, C)
    v = v_ref[:]                                       # (hb, Mp, Cv+1)

    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)  # (hb,BQ,Mp)
    if need_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    d = s - m
    p = expf(d.astype(pdt)) if pdt is not None else expf(d)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (hb, BQ, Cv+1)
    o_ref[:] = (acc[..., :-1] / acc[..., -1:]).astype(o_ref.dtype)
    if need_lse:
        lse_ref[:] = (m[..., 0] + logf(acc[..., -1]))[:, None, :]


# keep total VMEM well under the scoped-vmem budget (default XLA limit is
# 16 MB, --xla_tpu_scoped_vmem_limit_kib raises it); env-tunable in MB for
# sweeps under a raised limit (K+V resident, double-buffered q/out blocks,
# f32 accumulator)
_FULLKV_VMEM_BYTES = int(
    float(os.environ.get("LLT2I_FLASH_FULLKV_MB", "4")) * 1024 * 1024)
# whole-row variant: f32 scores (block_q x Mp) + bf16 exp'd copy resident
_WHOLEROW_S_BYTES = int(
    float(os.environ.get("LLT2I_FLASH_WHOLEROW_MB", "6")) * 1024 * 1024)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_q", "block_k", "kv_len", "interpret",
                     "need_lse", "exp_impl", "head_block", "wholerow_bytes",
                     "vmem_limit"),
)
def _flash_bh(q, k, v, scale: float, block_q: int, block_k: int, kv_len: int,
              interpret: bool, need_lse: bool = False, exp_impl: str = "exp",
              head_block: int = 1, wholerow_bytes: int = 0,
              vmem_limit: int = 0):
    """q/k: (BH, Np/Mp, Cp), v: (BH, Mp, Cp+1) with the appended ones column;
    kv_len is the true M. Returns out or (out, lse), lse: (BH, 1, Np) f32
    (the singleton middle dim satisfies Mosaic's sublane rule; see below).

    head_block > 1 runs the head-blocked whole-row kernel (hb heads per grid
    program); wholerow_bytes overrides the module score-row budget;
    vmem_limit (bytes, 0 = compiler default 16MB) raises Mosaic's
    scoped-VMEM ceiling for this kernel — the hb>1 variants need it (hb×
    resident K/V + the hb×BQ×Mp f32 score block exceed 16MB; measured OOM at
    16.27MB for hb=2/w12 on v5e, whose physical VMEM is 128MB). All three
    are STATIC so sweep variants retrace instead of reusing a jit cache
    keyed without them."""
    bh, np_, cp = q.shape
    mp = k.shape[1]
    cv1 = v.shape[2]
    num_kb = mp // block_k
    kv_bytes = 2 * mp * cp * q.dtype.itemsize
    wr_budget = wholerow_bytes or _WHOLEROW_S_BYTES
    hb = head_block if head_block > 1 and bh % head_block == 0 else 1

    # whole-row variant: shrink block_q until the f32 score row fits
    # (hb heads share one program, so the row budget divides by hb)
    mono_bq = block_q
    while mono_bq > 128 and hb * mono_bq * mp * 4 > wr_budget:
        mono_bq //= 2
    if os.environ.get("LLT2I_FLASH_MONO_GROW", "0") == "1":
        # small-KV sites (text cross-attention: Mp=128): GROW the q block
        # while the score row stays in budget — fewer, fatter programs
        # amortize per-program grid/DMA overhead when the KV side is tiny.
        # Mosaic handles the partial tail block when np_ % mono_bq != 0.
        while (mono_bq * 2 <= np_
               and hb * mono_bq * 2 * mp * 4 <= wr_budget):
            mono_bq *= 2
    use_mono = (
        kv_bytes <= _FULLKV_VMEM_BYTES   # per-head K/V residency budget
        and hb * mono_bq * mp * 4 <= wr_budget
        and os.environ.get("LLT2I_FLASH_MONO", "1") == "1"
    )
    if use_mono:
        block_q = mono_bq

    if use_mono and hb > 1:
        out_shapes = [jax.ShapeDtypeStruct((bh, np_, cp), q.dtype),
                      jax.ShapeDtypeStruct(
                          (bh, 1, np_) if need_lse else (1, 1), jnp.float32)]
        out_specs = [
            pl.BlockSpec((hb, block_q, cp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, 1, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM)
            if need_lse
            else pl.BlockSpec((1, 1), lambda b, i: (0, 0),
                              memory_space=pltpu.VMEM),
        ]
        kernel = functools.partial(
            _attn_kernel_wholerow_hb, kv_len=kv_len, scale=scale,
            need_lse=need_lse, need_mask=kv_len != mp, exp_impl=exp_impl,
        )
        out, lse = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shapes),
            grid=(bh // hb, pl.cdiv(np_, block_q)),
            in_specs=[
                pl.BlockSpec((hb, block_q, cp), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, mp, cp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hb, mp, cv1), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(out_specs),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=vmem_limit or None,
            ),
            interpret=interpret,
        )(q, k, v)
        return (out, lse) if need_lse else out

    out_shapes = [jax.ShapeDtypeStruct((bh, np_, cp), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, cp), lambda b, i, j=None: (b, i, 0),
                              memory_space=pltpu.VMEM)]
    # lse rides as (BH, 1, Np): a (1, block_q) block over (BH, Np) violates
    # Mosaic's sublane rule (dim -2 block of 1 over BH is neither a multiple
    # of 8 nor the full dim); with the singleton middle dim the block's last
    # two dims are (1==full, block_q%128==0)
    out_shapes.append(jax.ShapeDtypeStruct(
        (bh, 1, np_) if need_lse else (1, 1), jnp.float32))
    out_specs.append(
        pl.BlockSpec((1, 1, block_q), lambda b, i, j=None: (b, 0, i),
                     memory_space=pltpu.VMEM)
        if need_lse
        else pl.BlockSpec((1, 1), lambda b, i, j=None: (0, 0),
                          memory_space=pltpu.VMEM))

    need_mask = kv_len != mp
    if use_mono:
        kernel = functools.partial(
            _attn_kernel_wholerow, kv_len=kv_len, scale=scale,
            need_lse=need_lse, need_mask=need_mask, exp_impl=exp_impl,
        )
        out, lse = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shapes),
            grid=(bh, pl.cdiv(np_, block_q)),
            in_specs=[
                pl.BlockSpec((1, block_q, cp), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mp, cp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mp, cv1), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(out_specs),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=vmem_limit or None,
            ),
            interpret=interpret,
        )(q, k, v)
        return (out, lse) if need_lse else out

    if kv_bytes <= _FULLKV_VMEM_BYTES:
        kernel = functools.partial(
            _flash_kernel_fullkv, block_k=block_k, kv_len=kv_len, scale=scale,
            need_lse=need_lse, need_mask=need_mask, exp_impl=exp_impl,
        )
        out, lse = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shapes),
            # cdiv: Q rows need no padding — Mosaic handles a partial tail
            # block (garbage tail rows compute garbage that lands outside
            # the (bh, np_, cp) output, and every q row is independent)
            grid=(bh, pl.cdiv(np_, block_q)),
            in_specs=[
                pl.BlockSpec((1, block_q, cp), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mp, cp), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mp, cv1), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=tuple(out_specs),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=vmem_limit or None,
            ),
            interpret=interpret,
        )(q, k, v)
        return (out, lse) if need_lse else out

    grid = (bh, pl.cdiv(np_, block_q), num_kb)
    kernel = functools.partial(
        _flash_kernel, block_k=block_k, kv_len=kv_len, scale=scale,
        num_kb=num_kb, need_lse=need_lse, need_mask=need_mask,
        exp_impl=exp_impl,
    )
    out, lse = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, cp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, cp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, cv1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),   # running max
            pltpu.VMEM((block_q, cv1), jnp.float32),   # accumulator (+l col)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit or None,
        ),
        interpret=interpret,
    )(q, k, v)
    return (out, lse) if need_lse else out


# ---------------------------------------------------------------------------
# backward kernels


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref, dq_ref,
                   dq_scr, *, block_k: int, kv_len: int, scale: float,
                   num_kb: int, need_mask: bool, exp_impl: str):
    expf, _logf, qmul, pdt = _exp_cfg(exp_impl)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = jnp.transpose(lse_ref[0], (1, 0))   # (BQ, 1); base-2 under exp2
    dlt = jnp.transpose(dlt_ref[0], (1, 0))   # (BQ, 1)

    s = (scale * qmul) * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                             preferred_element_type=jnp.float32)
    if need_mask:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, _NEG_INF)
    d_ = s - lse
    p = (expf(d_.astype(pdt)) if pdt is not None else expf(d_)
         ).astype(jnp.float32)                 # (BQ, BK)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dlt)
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == num_kb - 1)
    def _finish():
        dq_ref[0] = (dq_scr[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float,
                    num_qb: int, exp_impl: str):
    expf, _logf, qmul, pdt = _exp_cfg(exp_impl)
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = jnp.transpose(lse_ref[0], (1, 0))   # (BQ, 1); base-2 under exp2
    dlt = jnp.transpose(dlt_ref[0], (1, 0))

    s = (scale * qmul) * jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                             preferred_element_type=jnp.float32)
    # padded key rows need no mask here: their dk/dv rows are sliced away,
    # and padded q rows contribute nothing because their dO is zero
    d_ = s - lse
    p = (expf(d_.astype(pdt)) if pdt is not None else expf(d_)
         ).astype(jnp.float32)                 # (BQ, BK)
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dlt)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(i == num_qb - 1)
    def _finish():
        dk_ref[0] = (dk_scr[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_k", "kv_len",
                              "interpret", "exp_impl"),
)
def _flash_bwd_bh(q, k, v, do, lse, delta, scale: float, block_q: int,
                  block_k: int, kv_len: int, interpret: bool,
                  exp_impl: str = "exp"):
    """Padded (BH, Np/Mp, Cp) inputs -> (dq, dk, dv) in the input dtype."""
    bh, np_, cp = q.shape
    mp = k.shape[1]
    num_kb = mp // block_k
    num_qb = np_ // block_q

    qspec = pl.BlockSpec((1, block_q, cp), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, block_k, cp), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                           memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, block_k=block_k, kv_len=kv_len,
                          scale=scale, num_kb=num_kb,
                          need_mask=kv_len != mp, exp_impl=exp_impl),
        out_shape=jax.ShapeDtypeStruct((bh, np_, cp), q.dtype),
        grid=(bh, num_qb, num_kb),
        in_specs=[qspec, kspec, kspec, qspec, rowspec, rowspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((block_q, cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    # swap loop order: per key block, stream query blocks
    qspec2 = pl.BlockSpec((1, block_q, cp), lambda b, j, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, block_k, cp), lambda b, j, i: (b, j, 0),
                          memory_space=pltpu.VMEM)
    rowspec2 = pl.BlockSpec((1, 1, block_q), lambda b, j, i: (b, 0, i),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, num_qb=num_qb,
                          exp_impl=exp_impl),
        out_shape=(jax.ShapeDtypeStruct((bh, mp, cp), k.dtype),
                   jax.ShapeDtypeStruct((bh, mp, cp), v.dtype)),
        grid=(bh, num_kb, num_qb),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rowspec2, rowspec2],
        out_specs=(kspec2, kspec2),
        scratch_shapes=[pltpu.VMEM((block_k, cp), jnp.float32),
                        pltpu.VMEM((block_k, cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry with custom VJP


def _pad_rows(x, rows):
    if rows == x.shape[1]:
        return x
    return jnp.pad(x, ((0, 0), (0, rows - x.shape[1]), (0, 0)))


def _prep(q, k, v, block_q, block_k, interpret, pad_q=True):
    b, h, n, c = q.shape
    m = k.shape[2]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # No column padding: Mosaic pads sub-128 minor dims inside VMEM tiles for
    # free, while an explicit jnp.pad materializes 128/c-times the HBM
    # traffic (for SD's d_head=40 that tripled attention bandwidth).
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(m, 128))
    if os.environ.get("LLT2I_FLASH_ADAPTIVE_K", "0") == "1":
        # Shrink block_k when that removes KV row padding (gated sites:
        # M=4126 pads to 4224 at bk=128 instead of 4608 at bk=512). OFF by
        # default: measured 44% SLOWER on-chip — the per-block fixed cost of
        # 33 small (bq,40)x(40,128) matmuls dwarfs the 8% padding saving
        # (scripts/sweep_flash.py, b=16: 250.6 -> 360.2 ms/eval).
        block_k = min(
            (bk for bk in (block_k, 256, 128) if bk <= block_k),
            key=lambda bk: (_round_up(m, bk), -bk),
        )
    np_ = _round_up(n, block_q)
    mp = _round_up(m, block_k)
    # pad_q=False (inference): the kernel grids cdiv over Q rows and Mosaic
    # handles the partial tail block, so the q pad and the output row slice
    # (plus ~10% wasted tail FLOPs on the M=4126 gated sites) disappear.
    # The training path keeps padded Q: the dK/dV backward kernel streams Q
    # blocks with an accumulating scratch and relies on zero padding.
    qf = (_pad_rows(q.reshape(b * h, n, c), np_) if pad_q
          else q.reshape(b * h, n, c))
    kf = _pad_rows(k.reshape(b * h, m, c), mp)
    vf = _pad_rows(v.reshape(b * h, m, c), mp)
    return qf, kf, vf, block_q, block_k, interpret


def _ones_col(vf):
    """Append the denominator column (see kernel docstring)."""
    bh, mp, _ = vf.shape
    return jnp.concatenate([vf, jnp.ones((bh, mp, 1), vf.dtype)], axis=-1)


_EXP_IMPLS = ("exp", "exp2", "bf16")


def _exp_impl_env() -> str:
    impl = os.environ.get("LLT2I_FLASH_EXP", "exp")
    assert impl in _EXP_IMPLS, impl
    return impl


def _grid_env():
    """(head_block, wholerow_bytes, vmem_limit) — the grid-level sweep knobs
    (VERDICT r3 item 6), read per call so scripts/sweep_flash.py variants
    retrace (all three are static jit args of _flash_bh). LLT2I_FLASH_VMEM_MB
    (0 = compiler default 16MB) raises Mosaic's scoped-VMEM ceiling so
    head-blocked variants whose resident K/V + score block exceed 16MB can
    compile (v5e physical VMEM is 128MB)."""
    hb = int(os.environ.get("LLT2I_FLASH_HEAD_BLOCK", "1"))
    wr = int(float(os.environ.get("LLT2I_FLASH_WHOLEROW_MB", "6"))
             * 1024 * 1024)
    vm = int(float(os.environ.get("LLT2I_FLASH_VMEM_MB", "0")) * 1024 * 1024)
    return hb, wr, vm


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(q, k, v, scale, block_q=256, block_k=512, interpret=None):
    """q: (B, H, N, C), k/v: (B, H, M, C) -> (B, H, N, C). Differentiable."""
    b, h, n, c = q.shape
    m = k.shape[2]
    qf, kf, vf, bq, bk, interp = _prep(q, k, v, block_q, block_k, interpret,
                                       pad_q=False)
    hb, wr, vm = _grid_env()
    out = _flash_bh(qf, kf, _ones_col(vf), scale, bq, bk, m, interp,
                    need_lse=False, exp_impl=_exp_impl_env(),
                    head_block=hb, wholerow_bytes=wr, vmem_limit=vm)
    return out.reshape(b, h, n, c)


def _flash_fwd_rule(q, k, v, scale, block_q, block_k, interpret):
    b, h, n, c = q.shape
    m = k.shape[2]
    qf, kf, vf, bq, bk, interp = _prep(q, k, v, block_q, block_k, interpret)
    exp_impl = _exp_impl_env()
    hb, wr, vm = _grid_env()
    out, lse = _flash_bh(qf, kf, _ones_col(vf), scale, bq, bk, m, interp,
                         need_lse=True, exp_impl=exp_impl,
                         head_block=hb, wholerow_bytes=wr, vmem_limit=vm)
    # residuals must be JAX types: encode the impl as an index into _EXP_IMPLS
    return out[:, :n, :].reshape(b, h, n, c), (qf, kf, vf, out, lse, bq, bk,
                                               interp, n, m,
                                               _EXP_IMPLS.index(exp_impl))


def _flash_bwd_rule(scale, block_q, block_k, interpret, res, g):
    # exp_impl rides in the residuals: the lse is base-2 under exp2/bf16, so
    # the backward must decode it with the same impl the forward used even if
    # the env var changed between traces
    qf, kf, vf, out, lse, bq, bk, interp, n, m, exp_idx = res
    exp_impl = _EXP_IMPLS[int(exp_idx)]
    bh, np_, c = qf.shape
    b_times_h = bh
    gf = _pad_rows(g.reshape(b_times_h, n, c), np_).astype(qf.dtype)
    delta = jnp.sum(gf.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1)[:, None, :]           # (BH, 1, Np)
    dq, dk, dv = _flash_bwd_bh(qf, kf, vf, gf, lse, delta, scale, bq, bk, m,
                               interp, exp_impl=exp_impl)
    shape_q = g.shape
    dq = dq[:, :n, :].reshape(shape_q)
    dk = dk[:, :m, :].reshape(shape_q[0], shape_q[1], m, c)
    dv = dv[:, :m, :].reshape(shape_q[0], shape_q[1], m, c)
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)
