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
    return (
        os.environ.get("LLT2I_DISABLE_FUSED_NORM", "0") != "1"
        and jax.default_backend() == "tpu"
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
    h = linear(proj, x)
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * gelu(gate)
    return linear(p["net"]["2"], h)


def nearest_upsample_2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def avg_pool_2x(x):
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
