"""Grounding tokenizers (PositionNet family).

Reference: GLIGEN/ldm/modules/diffusionmodules/text_grounding_net.py:6-43 and
text_image_grounding_net.py:9-65. Boxes are Fourier-embedded, padding slots
are replaced with learnable null embeddings, and a 3-layer SiLU MLP emits the
768-d grounding tokens consumed by the gated self-attention fusers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.schedules import fourier_embed
from . import initializers as init


def position_net(p, boxes, masks, positive_embeddings, fourier_freqs: int = 8):
    """boxes: (B, N, 4); masks: (B, N); positive_embeddings: (B, N, in_dim)."""
    m = masks[..., None].astype(positive_embeddings.dtype)
    xyxy = fourier_embed(boxes, num_freqs=fourier_freqs).astype(positive_embeddings.dtype)

    pos_null = p["null_positive_feature"].reshape(1, 1, -1).astype(positive_embeddings.dtype)
    xyxy_null = p["null_position_feature"].reshape(1, 1, -1).astype(positive_embeddings.dtype)
    positive = positive_embeddings * m + (1 - m) * pos_null
    xyxy = xyxy * m + (1 - m) * xyxy_null

    h = jnp.concatenate([positive, xyxy], axis=-1)
    h = nn.silu(nn.linear(p["linears"]["0"], h))
    h = nn.silu(nn.linear(p["linears"]["2"], h))
    return nn.linear(p["linears"]["4"], h)


def init_position_net(key, in_dim: int = 768, out_dim: int = 768,
                      fourier_freqs: int = 8):
    position_dim = fourier_freqs * 2 * 4
    ks = jax.random.split(key, 3)
    return {
        "linears": {
            "0": init.linear_p(ks[0], in_dim + position_dim, 512),
            "2": init.linear_p(ks[1], 512, 512),
            "4": init.linear_p(ks[2], 512, out_dim),
        },
        "null_positive_feature": init.zeros_p((in_dim,)),
        "null_position_feature": init.zeros_p((position_dim,)),
    }


def position_net_text_image(p, boxes, masks, text_masks, image_masks,
                            text_embeddings, image_embeddings,
                            fourier_freqs: int = 8):
    """Dual text+image grounding tokenizer (text_image_grounding_net.py:9-65).

    Emits 2N tokens: N text-grounded then N image-grounded.
    """
    dtype = text_embeddings.dtype
    m = masks[..., None].astype(dtype)
    tm = text_masks[..., None].astype(dtype)
    im = image_masks[..., None].astype(dtype)
    xyxy = fourier_embed(boxes, num_freqs=fourier_freqs).astype(dtype)

    text_null = p["null_text_feature"].reshape(1, 1, -1).astype(dtype)
    image_null = p["null_image_feature"].reshape(1, 1, -1).astype(dtype)
    xyxy_null = p["null_position_feature"].reshape(1, 1, -1).astype(dtype)

    text = text_embeddings * tm + (1 - tm) * text_null
    image = image_embeddings * im + (1 - im) * image_null
    xyxy = xyxy * m + (1 - m) * xyxy_null

    def mlp(q, h):
        h = nn.silu(nn.linear(q["0"], h))
        h = nn.silu(nn.linear(q["2"], h))
        return nn.linear(q["4"], h)

    objs_text = mlp(p["linears_text"], jnp.concatenate([text, xyxy], axis=-1))
    objs_image = mlp(p["linears_image"], jnp.concatenate([image, xyxy], axis=-1))
    return jnp.concatenate([objs_text, objs_image], axis=1)


def init_position_net_text_image(key, in_dim: int = 768, out_dim: int = 768,
                                 fourier_freqs: int = 8):
    position_dim = fourier_freqs * 2 * 4
    ks = jax.random.split(key, 6)
    mk = lambda k0, k1, k2: {
        "0": init.linear_p(k0, in_dim + position_dim, 512),
        "2": init.linear_p(k1, 512, 512),
        "4": init.linear_p(k2, 512, out_dim),
    }
    return {
        "linears_text": mk(ks[0], ks[1], ks[2]),
        "linears_image": mk(ks[3], ks[4], ks[5]),
        "null_text_feature": init.zeros_p((in_dim,)),
        "null_image_feature": init.zeros_p((in_dim,)),
        "null_position_feature": init.zeros_p((position_dim,)),
    }
