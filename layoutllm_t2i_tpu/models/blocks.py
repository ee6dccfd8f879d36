"""GLIGEN/LayoutLLM-T2I transformer blocks as pure functions.

Reference: GLIGEN/ldm/modules/attention.py. Parameter pytrees mirror the torch
module names; all blocks take a ``heads`` count and an optional ``fuser_scale``
traced scalar that replaces the reference's host-side ``set_alpha_scale``
module mutation (txt2img.py:46-50) so the whole sampling loop can live in one
compiled scan.

The relation fuser (attention.py:284-359, the paper's novel layer) is
vectorized: the reference's per-(batch, object) Python loop with .tolist()
device syncs becomes a rasterized box mask (B, MO, H*W) and two batched
matmuls (masked segment-mean pooling and masked scatter-add). The loop's
break-on-first-degenerate-box semantics are reproduced with a cumulative
product over the object axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.attention import attention_with_projections, multi_head_attention
from . import initializers as init


# ---------------------------------------------------------------------------
# attention wrappers


def cross_attention(p, x, key, value, heads: int, mask=None, impl: str = "auto"):
    return attention_with_projections(p, x, key, value, heads, mask=mask, impl=impl)


def self_attention(p, x, heads: int, impl: str = "auto"):
    return cross_attention(p, x, x, x, heads, impl=impl)


def init_cross_attention(key, query_dim, key_dim, value_dim, heads, d_head):
    inner = heads * d_head
    ks = jax.random.split(key, 4)
    return {
        "to_q": init.linear_p(ks[0], query_dim, inner, bias=False),
        "to_k": init.linear_p(ks[1], key_dim, inner, bias=False),
        "to_v": init.linear_p(ks[2], value_dim, inner, bias=False),
        "to_out": {"0": init.linear_p(ks[3], inner, query_dim)},
    }


def init_ff(key, dim, mult: int = 4):
    inner = dim * mult
    k1, k2 = jax.random.split(key)
    return {
        "net": {
            "0": {"proj": init.linear_p(k1, dim, inner * 2)},
            "2": init.linear_p(k2, inner, dim),
        }
    }


# ---------------------------------------------------------------------------
# gated fusers (attention.py:181-281)


def _gate(scale, alpha, dtype):
    """(scale * tanh(alpha)) computed in f32, cast ONCE to the activation
    dtype. Both factors must be cast: the scanned fuser_scale is a traced
    f32 scalar (round-1 bug) and alpha is an f32 checkpoint/master param —
    either one uncast promotes every activation downstream of the first
    fuser to f32 (round 2 fixed the scale; the f32-param path surfaced the
    tanh(alpha) leak when the trainer's preview ran f32 master weights)."""
    g = jnp.asarray(scale, jnp.float32) * jnp.tanh(alpha.astype(jnp.float32))
    return g.astype(dtype)


def gated_self_attention(p, x, objs, heads: int, scale, impl: str = "auto"):
    n_visual = x.shape[1]
    objs = nn.linear(p["linear"], objs)
    cat = jnp.concatenate([x, objs], axis=1)
    attn_out = self_attention(p["attn"], nn.layer_norm(p["norm1"], cat), heads, impl=impl)
    attn_out = attn_out[:, :n_visual, :]
    x = x + _gate(scale, p["alpha_attn"], x.dtype) * attn_out
    x = nn.ln_geglu_ff_scaled_res(p["ff"], p["norm2"], x,
                                  _gate(scale, p["alpha_dense"], x.dtype))
    return x


def gated_cross_attention(p, x, objs, heads: int, scale, impl: str = "auto"):
    x = x + _gate(scale, p["alpha_attn"], x.dtype) * cross_attention(
        p["attn"], nn.layer_norm(p["norm1"], x), objs, objs, heads, impl=impl
    )
    x = nn.ln_geglu_ff_scaled_res(p["ff"], p["norm2"], x,
                                  _gate(scale, p["alpha_dense"], x.dtype))
    return x


def gated_self_attention2(p, x, objs, heads: int, scale, impl: str = "auto"):
    """Interpolating variant (attention.py:237-281): grounding-token slice is
    resized to the visual grid with bicubic interpolation and added."""
    b, n_visual, _ = x.shape
    n_ground = objs.shape[1]
    size_v = int(round(n_visual ** 0.5))
    size_g = int(round(n_ground ** 0.5))
    assert size_v * size_v == n_visual and size_g * size_g == n_ground

    objs = nn.linear(p["linear"], objs)
    cat = jnp.concatenate([x, objs], axis=1)
    out = self_attention(p["attn"], nn.layer_norm(p["norm1"], cat), heads, impl=impl)
    out = out[:, n_visual:, :].reshape(b, size_g, size_g, -1)
    out = jax.image.resize(out, (b, size_v, size_v, out.shape[-1]), method="bicubic")
    residual = out.reshape(b, n_visual, -1)
    x = x + _gate(scale, p["alpha_attn"], x.dtype) * residual
    x = nn.ln_geglu_ff_scaled_res(p["ff"], p["norm2"], x,
                                  _gate(scale, p["alpha_dense"], x.dtype))
    return x


def init_gated_self_attention(key, query_dim, context_dim, heads, d_head):
    ks = jax.random.split(key, 3)
    return {
        "linear": init.linear_p(ks[0], context_dim, query_dim),
        "attn": init_cross_attention(ks[1], query_dim, query_dim, query_dim, heads, d_head),
        "ff": init_ff(ks[2], query_dim),
        "norm1": init.norm_p(query_dim),
        "norm2": init.norm_p(query_dim),
        "alpha_attn": init.scalar_p(0.0),
        "alpha_dense": init.scalar_p(0.0),
    }


def init_gated_cross_attention(key, query_dim, key_dim, value_dim, heads, d_head):
    ks = jax.random.split(key, 2)
    return {
        "attn": init_cross_attention(ks[0], query_dim, key_dim, value_dim, heads, d_head),
        "ff": init_ff(ks[1], query_dim),
        "norm1": init.norm_p(query_dim),
        "norm2": init.norm_p(query_dim),
        "alpha_attn": init.scalar_p(0.0),
        "alpha_dense": init.scalar_p(0.0),
    }


# ---------------------------------------------------------------------------
# relation cross attention (attention.py:284-359), vectorized


def rasterize_boxes(boxes, masks, h: int, w: int):
    """Per-object region masks on the (h, w) grid.

    boxes: (B, MO, 4) normalized xyxy; masks: (B, MO) 0/1 validity.
    Returns (region, processed): region (B, MO, h*w) float 0/1 including the
    reference's break-at-first-degenerate semantics, processed (B, MO) bool.
    Pixel bounds use trunc-toward-zero ints exactly like the reference
    (attention.py:325-330): x in [int(x0*w), int(min(x1*w, w))).
    """
    b, mo, _ = boxes.shape
    nbox = jnp.sum(masks, axis=-1)  # (B,)
    x0 = (boxes[:, :, 0] * w).astype(jnp.int32)
    y0 = (boxes[:, :, 1] * h).astype(jnp.int32)
    x1 = jnp.minimum(boxes[:, :, 2] * w, w).astype(jnp.int32)
    y1 = jnp.minimum(boxes[:, :, 3] * h, h).astype(jnp.int32)
    nondegen = (x0 != x1) & (y0 != y1)
    within = jnp.arange(mo)[None, :] < nbox[:, None]
    # the reference loop `break`s at the first padded or degenerate box, so a
    # later valid box after a degenerate one is also skipped
    processed = jnp.cumprod((nondegen & within).astype(jnp.int32), axis=1).astype(bool)

    rows = jnp.arange(h)
    cols = jnp.arange(w)
    row_in = (rows[None, None, :] >= y0[:, :, None]) & (rows[None, None, :] < y1[:, :, None])
    col_in = (cols[None, None, :] >= x0[:, :, None]) & (cols[None, None, :] < x1[:, :, None])
    region = row_in[:, :, :, None] & col_in[:, :, None, :]  # (B, MO, h, w)
    region = region & processed[:, :, None, None]
    return region.reshape(b, mo, h * w), processed


def relation_cross_attention(p, x, relations, boxes, masks, h: int, w: int,
                             heads: int, scale=1.0, impl: str = "auto"):
    """x: (B, h*w, C) row-major; relations: (B, R, 768); boxes: (B, MO, 4).

    Returns the fused hidden state; the caller blends ``(out + x) / 2``
    (attention.py:398).
    """
    b, hw, c = x.shape
    mo = boxes.shape[1]
    hidden = nn.layer_norm(p["norm3"], x)

    region, _ = rasterize_boxes(boxes, masks, h, w)
    regionf = region.astype(hidden.dtype)
    counts = jnp.maximum(jnp.sum(regionf, axis=-1), 1.0)  # (B, MO)
    obj = jnp.einsum("bmn,bnc->bmc", regionf, hidden) / counts[..., None]

    attn_out = cross_attention(
        p["attn"], nn.layer_norm(p["norm1"], obj), relations, relations, heads, impl=impl
    )
    obj = obj + _gate(scale, p["alpha_attn"], obj.dtype) * attn_out
    obj = obj + _gate(scale, p["alpha_dense"], obj.dtype) * nn.geglu_ff(
        p["ff"], nn.layer_norm(p["norm2"], obj)
    )

    # mean over objects of (hidden + region_i * obj_i) == hidden + scatter/MO
    out = hidden + jnp.einsum("bmn,bmc->bnc", regionf, obj) / mo
    return out


def init_relation_cross_attention(key, query_dim, key_dim, value_dim, heads, d_head):
    ks = jax.random.split(key, 2)
    return {
        "attn": init_cross_attention(ks[0], query_dim, key_dim, value_dim, heads, d_head),
        "ff": init_ff(ks[1], query_dim),
        "norm1": init.norm_p(query_dim),
        "norm2": init.norm_p(query_dim),
        "norm3": init.norm_p(query_dim),
        "alpha_attn": init.scalar_p(0.0),
        "alpha_dense": init.scalar_p(0.0),
    }


# ---------------------------------------------------------------------------
# transformer block + spatial transformer (attention.py:362-446)

_FUSERS = {
    "gatedSA": gated_self_attention,
    "gatedSA2": gated_self_attention2,
    "gatedCA": gated_cross_attention,
}


def basic_transformer_block(p, x, context, objs, relations, boxes, masks,
                            h: int, w: int, heads: int, fuser_scale=1.0,
                            fuser_type: str = "gatedSA", impl: str = "auto",
                            use_rela: bool = True, skip_gated: bool = False):
    x = self_attention(p["attn1"], nn.layer_norm(p["norm1"], x), heads, impl=impl) + x
    if not skip_gated:
        # skip_gated: the sampler statically knows fuser_scale == 0 for this
        # step (alpha_generator's trailing stage) — every gated contribution
        # is x + 0*(...) = x exactly, so the fuser attention + FF are dead
        # compute and eliding them is bit-exact (see samplers.plms_sample)
        x = _FUSERS[fuser_type](p["fuser"], x, objs, heads, fuser_scale, impl=impl)
    if use_rela:
        # NOTE: the relation fuser keeps scale=1 always — set_alpha_scale only
        # touches the gated fusers (txt2img.py:46-50)
        x = (relation_cross_attention(p["rela_fuse"], x, relations, boxes, masks,
                                      h, w, heads, impl=impl) + x) / 2
    x = cross_attention(p["attn2"], nn.layer_norm(p["norm2"], x), context, context,
                        heads, impl=impl) + x
    x = nn.ln_geglu_ff_res(p["ff"], p["norm3"], x)
    return x


def init_basic_transformer_block(key, query_dim, key_dim, value_dim, heads, d_head,
                                 fuser_type: str = "gatedSA", use_rela: bool = True):
    ks = jax.random.split(key, 5)
    if fuser_type in ("gatedSA", "gatedSA2"):
        fuser = init_gated_self_attention(ks[3], query_dim, key_dim, heads, d_head)
    else:
        fuser = init_gated_cross_attention(ks[3], query_dim, key_dim, value_dim, heads, d_head)
    p = {
        "attn1": init_cross_attention(ks[0], query_dim, query_dim, query_dim, heads, d_head),
        "ff": init_ff(ks[1], query_dim),
        "attn2": init_cross_attention(ks[2], query_dim, key_dim, value_dim, heads, d_head),
        "norm1": init.norm_p(query_dim),
        "norm2": init.norm_p(query_dim),
        "norm3": init.norm_p(query_dim),
        "fuser": fuser,
    }
    if use_rela:
        # the vanilla GLIGEN UNet (openaimodel_original.py) has no rela_fuse —
        # omitting it keeps plain-GLIGEN checkpoints loadable strict
        p["rela_fuse"] = init_relation_cross_attention(ks[4], query_dim, key_dim,
                                                       value_dim, heads, d_head)
    return p


def spatial_transformer(p, x, context, objs, relations, boxes, masks, heads: int,
                        fuser_scale=1.0, fuser_type: str = "gatedSA",
                        depth: int = 1, impl: str = "auto", use_rela: bool = True,
                        skip_gated: bool = False):
    """x: (B, H, W, C) NHWC. Conv-in/out are 1x1 (attention.py:405-446)."""
    b, h, w, cin = x.shape
    x_in = x
    x = nn.group_norm(p["norm"], x, eps=1e-6)
    x = nn.conv2d(p["proj_in"], x, padding=0)
    x = x.reshape(b, h * w, -1)
    for d in range(depth):
        x = basic_transformer_block(
            p["transformer_blocks"][str(d)], x, context, objs, relations, boxes,
            masks, h, w, heads, fuser_scale, fuser_type, impl=impl, use_rela=use_rela,
            skip_gated=skip_gated,
        )
    x = x.reshape(b, h, w, -1)
    x = nn.conv2d(p["proj_out"], x, padding=0)
    return x + x_in


def init_spatial_transformer(key, in_channels, key_dim, value_dim, heads, d_head,
                             depth: int = 1, fuser_type: str = "gatedSA",
                             use_rela: bool = True):
    query_dim = heads * d_head
    ks = jax.random.split(key, depth + 2)
    return {
        "norm": init.norm_p(in_channels),
        "proj_in": init.conv_p(ks[0], 1, 1, in_channels, query_dim),
        "transformer_blocks": {
            str(d): init_basic_transformer_block(ks[2 + d], query_dim, key_dim,
                                                 value_dim, heads, d_head,
                                                 fuser_type, use_rela)
            for d in range(depth)
        },
        "proj_out": init.conv_p(ks[1], 1, 1, query_dim, in_channels),
    }
