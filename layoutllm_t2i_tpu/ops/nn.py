"""Primitive NN ops as pure functions over parameter pytrees.

Layout conventions (TPU-native):
  * activations are NHWC (torch reference is NCHW);
  * conv kernels are HWIO (converted from torch OIHW);
  * linear kernels are (in, out) (converted from torch (out, in)).

Parameter pytrees are nested dicts whose keys mirror the torch module names
(e.g. ``params['in_layers']['0']['weight']``), which makes `.pth` checkpoint
conversion mechanical (see checkpoint/convert.py).

Numerical parity notes vs the reference:
  * GroupNorm32 (GLIGEN util.py:226-228) computes in float32 and casts back —
    all norms here compute statistics in float32;
  * GEGLU (GLIGEN attention.py:38-45) uses torch's exact (erf) GELU, so we
    pass ``approximate=False``;
  * eps values differ per site: UNet res-blocks use torch's GroupNorm default
    1e-5, spatial-transformer/VAE norms use 1e-6.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax


def _fused_norms_enabled() -> bool:
    """Pallas one-pass norm kernels: TPU-only (tests exercise them in
    interpreter mode directly, see tests/test_norm_kernels.py)."""
    from ..parallel.tp import current_tp

    return (
        os.environ.get("LLT2I_DISABLE_FUSED_NORM", "0") != "1"
        and jax.default_backend() == "tpu"
        and current_tp() is None
    )


def _pallas_matmul_enabled() -> bool:
    """Pallas GEMM for the big FF/projection sites. OPT-IN
    (LLT2I_PALLAS_MATMUL=1): measured SLOWER than XLA's dots in the full
    b=16 UNet (55 ms vs ~34 ms — grid-step overhead dominates at K=320 and
    the boundary layouts did not improve; PERF.md round 2). Kept for
    experimentation; tests hit the kernels in interpreter mode directly
    (tests/test_matmul_kernels.py)."""
    return (
        os.environ.get("LLT2I_PALLAS_MATMUL", "0") == "1"
        and jax.default_backend() == "tpu"
    )


def _pallas_ffn_enabled() -> bool:
    """Fully fused FF kernel (up-proj + GEGLU + down-proj + residual in one
    pallas_call, intermediate VMEM-resident; ops/pallas/ffn.py). Opt-out
    (LLT2I_PALLAS_FFN=0): unlike round 2's generic GEMM experiments this
    removes the (M, 2*inner) HBM round-trip entirely (PERF.md round 3)."""
    from ..parallel.tp import current_tp

    return (
        os.environ.get("LLT2I_PALLAS_FFN", "1") == "1"
        and jax.default_backend() == "tpu"
        and current_tp() is None
    )


def _ffn_int8_site(p_ff, p_norm, x, s):
    """Try the int8 FFN kernel (ops/pallas/ffn.py ffn_ln_geglu_scaled_q) for
    an LN+GEGLU-FF+residual site with quantized weights; None if ineligible.
    Opt-in (LLT2I_FFN_INT8=1) until the on-chip A/B: the default int8 route
    is the XLA dots with the dequant fused in (see _ffn_quantized)."""
    if os.environ.get("LLT2I_FFN_INT8", "0") != "1":
        return None
    from .quant import is_quantized

    proj = p_ff["net"]["0"]["proj"]
    out = p_ff["net"]["2"]
    if not (is_quantized(proj.get("weight")) and is_quantized(out.get("weight"))):
        return None
    if proj.get("bias") is None or out.get("bias") is None:
        return None
    from .pallas.ffn import ffn_eligible, ffn_ln_geglu_scaled_q

    qw, ow = proj["weight"], out["weight"]
    k, n2 = qw.shape
    inner = n2 // 2
    m = 1
    for d in x.shape[:-1]:
        m *= d
    if not ffn_eligible(m, k, inner, x.dtype.itemsize):
        return None
    y = ffn_ln_geglu_scaled_q(
        x.reshape(m, k), qw.q[:, :inner], qw.q[:, inner:],
        qw.scale[:inner], qw.scale[inner:],
        proj["bias"][:inner], proj["bias"][inner:],
        ow.q, ow.scale, out["bias"],
        p_norm["weight"], p_norm["bias"], s)
    return y.reshape(x.shape)


def _ffn_quantized(proj, out) -> bool:
    """int8 weights skip the Pallas FFN path: a pallas_call operand can't
    absorb the dequant as a fusion producer, so the fused kernel would force
    a per-scan-step dense bf16 weight materialization in HBM — the exact
    traffic int8 mode exists to remove. The XLA dots fuse the dequant
    (ops/quant.py)."""
    from .quant import is_quantized

    return is_quantized(proj.get("weight")) or is_quantized(out.get("weight"))


def linear(p, x):
    w = p["weight"]
    if _pallas_matmul_enabled():
        from .pallas.matmul import _eligible, linear_fused

        m = 1
        for d in x.shape[:-1]:
            m *= d
        if _eligible(m, x.shape[-1], w.shape[1]):
            y = linear_fused(x.reshape(m, x.shape[-1]), w.astype(x.dtype),
                             p.get("bias"))
            return y.reshape(*x.shape[:-1], w.shape[1])
    y = jnp.dot(x, w.astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv2d(p, x, stride: int = 1, padding=1):
    """2-D conv; x: NHWC, kernel: HWIO. ``padding`` is an int or explicit list.

    1x1 stride-1 convs lower to a plain dot over the channel axis: XLA TPU
    keeps them as convolution ops in its conv-preferred {3,0,2,1} activation
    layout, which forces {3,0,2,1}<->{3,2,1,0} copy pairs at every
    spatial-transformer/Pallas boundary (see PERF.md round 3); as dots they
    stay in the standard layout the attention path needs.
    (LLT2I_CONV1X1_DOT=0 restores the conv lowering for A/B runs.)
    """
    from ..parallel.tp import shard_rows

    # 'spatial' TP latency mode: image rows sharded over the mesh, halo
    # exchanges for the 3x3 windows derived by GSPMD (parallel/tp.py)
    x = shard_rows(x)
    w = p["weight"]
    if (w.shape[0] == 1 and w.shape[1] == 1 and stride == 1 and padding == 0
            and os.environ.get("LLT2I_CONV1X1_DOT", "1") == "1"):
        y = jnp.dot(x, w[0, 0].astype(x.dtype))
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-5,
               silu: bool = False):
    """GroupNorm over NHWC with float32 statistics (GroupNorm32 parity).

    ``silu=True`` fuses the SiLU that follows every UNet/VAE norm-before-conv
    site; on TPU this dispatches to the one-pass Pallas kernel
    (ops/pallas/norms.py) which reads the activation from HBM once.
    """
    if _fused_norms_enabled():
        from .pallas.norms import group_norm_silu

        return group_norm_silu(x, p["weight"], p["bias"], num_groups, eps, silu)
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h, w, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    xf = xf * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    if silu:
        xf = xf * jax.nn.sigmoid(xf)
    return xf.astype(x.dtype)


def layer_norm(p, x, eps: float = 1e-5):
    if _fused_norms_enabled():
        from .pallas.norms import layer_norm_fused

        return layer_norm_fused(x, p["weight"], p["bias"], eps)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return xf.astype(x.dtype)


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def geglu_ff(p, x):
    """FeedForward(glu=True): Linear(d->8d) -> x*gelu(gate) -> Linear(4d->d).

    Torch names: net.0.proj (GEGLU projection), net.2 (output linear);
    reference GLIGEN/ldm/modules/attention.py:38-65. On TPU the projection
    runs as one fused Pallas GEMM computing a*gelu(gate) directly (halves
    the projection's HBM output traffic).
    """
    proj = p["net"]["0"]["proj"]
    if _pallas_matmul_enabled():
        from .pallas.matmul import _eligible, geglu_fused

        w = proj["weight"]
        k, n2 = w.shape
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if _eligible(m, k, n2 // 2):
            wd = w.astype(x.dtype)
            wa, wg = wd[:, : n2 // 2], wd[:, n2 // 2:]
            bias = proj.get("bias")
            ba = bg = None
            if bias is not None:
                ba, bg = bias[: n2 // 2], bias[n2 // 2:]
            h = geglu_fused(x.reshape(m, k), wa, wg, ba, bg)
            h = h.reshape(*x.shape[:-1], n2 // 2)
            return linear(p["net"]["2"], h)
    from ..parallel.tp import current_tp, replicate_out, shard_inner

    if current_tp() is not None:
        # Megatron column->row pattern, derived by GSPMD: the packed GEGLU
        # weight is split into its a/gate halves so each half's output can
        # be constrained on the inner axis (a contiguous shard of the packed
        # (2*inner) dim would land a and gate on different device subsets);
        # the down-projection contracts over the sharded inner dim -> psum.
        w = proj["weight"]
        inner = w.shape[1] // 2
        wd = w.astype(x.dtype)
        a = shard_inner(jnp.dot(x, wd[:, :inner]))
        gate = shard_inner(jnp.dot(x, wd[:, inner:]))
        if proj.get("bias") is not None:
            a = a + proj["bias"][:inner].astype(x.dtype)
            gate = gate + proj["bias"][inner:].astype(x.dtype)
        h = a * gelu(gate)
        out = p["net"]["2"]
        y = replicate_out(jnp.dot(h, out["weight"].astype(x.dtype)))
        if out.get("bias") is not None:
            y = y + out["bias"].astype(x.dtype)
        return y
    h = linear(proj, x)
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * gelu(gate)
    return linear(p["net"]["2"], h)


def geglu_ff_res(p, x, residual):
    """geglu_ff(p, x) + residual — the BasicTransformerBlock's
    `ff(norm3(x)) + x` site (GLIGEN attention.py:394-402). On TPU the whole
    FF (both matmuls, GEGLU gate, output bias, residual add) runs as ONE
    Pallas kernel with the (M, inner) gated activation VMEM-resident
    (ops/pallas/ffn.py)."""
    proj = p["net"]["0"]["proj"]
    out = p["net"]["2"]
    if _pallas_ffn_enabled() and not _ffn_quantized(proj, out) \
            and proj.get("bias") is not None \
            and out.get("bias") is not None:
        from .pallas.ffn import ffn_eligible, ffn_geglu_fused

        w = proj["weight"]
        k, n2 = w.shape
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if ffn_eligible(m, k, n2 // 2):
            wd = w.astype(x.dtype)
            y = ffn_geglu_fused(
                x.reshape(m, k), wd[:, : n2 // 2], wd[:, n2 // 2:],
                proj["bias"][: n2 // 2], proj["bias"][n2 // 2:],
                out["weight"].astype(x.dtype), out["bias"],
                residual.reshape(m, k))
            return y.reshape(x.shape)
    return geglu_ff(p, x) + residual


def ln_geglu_ff_res(p_ff, p_norm, x):
    """geglu_ff(p_ff, layer_norm(p_norm, x)) + x as ONE Pallas kernel: the
    LN is computed in-kernel (XLA can't fuse it into a custom call, so
    leaving it outside would make it a standalone bandwidth op) and the raw
    x block doubles as the residual. LLT2I_FFN_LN=0 splits the LN back out
    (for A/B), falling through to geglu_ff_res."""
    proj = p_ff["net"]["0"]["proj"]
    out = p_ff["net"]["2"]
    if _pallas_ffn_enabled() and os.environ.get("LLT2I_FFN_LN", "1") == "1":
        y = _ffn_int8_site(p_ff, p_norm, x, 1.0)
        if y is not None:
            return y
    if _pallas_ffn_enabled() and os.environ.get("LLT2I_FFN_LN", "1") == "1" \
            and not _ffn_quantized(proj, out) \
            and proj.get("bias") is not None and out.get("bias") is not None:
        from .pallas.ffn import ffn_eligible, ffn_ln_geglu_fused

        w = proj["weight"]
        k, n2 = w.shape
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if ffn_eligible(m, k, n2 // 2):
            wd = w.astype(x.dtype)
            y = ffn_ln_geglu_fused(
                x.reshape(m, k), wd[:, : n2 // 2], wd[:, n2 // 2:],
                proj["bias"][: n2 // 2], proj["bias"][n2 // 2:],
                out["weight"].astype(x.dtype), out["bias"],
                p_norm["weight"], p_norm["bias"])
            return y.reshape(x.shape)
    return geglu_ff_res(p_ff, layer_norm(p_norm, x), x)


def ln_geglu_ff_scaled_res(p_ff, p_norm, x, s):
    """x + s * geglu_ff(p_ff, layer_norm(p_norm, x)) — the gated fusers'
    dense branch (s = fuser_scale * tanh(alpha_dense)), fused like
    ln_geglu_ff_res with the scalar applied in the kernel epilogue."""
    proj = p_ff["net"]["0"]["proj"]
    out = p_ff["net"]["2"]
    if _pallas_ffn_enabled() and os.environ.get("LLT2I_FFN_LN", "1") == "1":
        y = _ffn_int8_site(p_ff, p_norm, x, s)
        if y is not None:
            return y
    if _pallas_ffn_enabled() and os.environ.get("LLT2I_FFN_LN", "1") == "1" \
            and not _ffn_quantized(proj, out) \
            and proj.get("bias") is not None and out.get("bias") is not None:
        from .pallas.ffn import ffn_eligible, ffn_ln_geglu_scaled

        w = proj["weight"]
        k, n2 = w.shape
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if ffn_eligible(m, k, n2 // 2):
            wd = w.astype(x.dtype)
            y = ffn_ln_geglu_scaled(
                x.reshape(m, k), wd[:, : n2 // 2], wd[:, n2 // 2:],
                proj["bias"][: n2 // 2], proj["bias"][n2 // 2:],
                out["weight"].astype(x.dtype), out["bias"],
                p_norm["weight"], p_norm["bias"], s)
            return y.reshape(x.shape)
    return x + jnp.asarray(s).astype(x.dtype) * geglu_ff(
        p_ff, layer_norm(p_norm, x))


def nearest_upsample_2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def avg_pool_2x(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
