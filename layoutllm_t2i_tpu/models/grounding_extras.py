"""Additional GLIGEN grounding tokenizers & downsamplers (capability surface).

Reference: GLIGEN/ldm/modules/diffusionmodules/{keypoint_grounding_net.py,
canny_grounding_downsampler.py, hed/depth/normal/sem variants}. These cover
the upstream GLIGEN modalities beyond box+text: person keypoints and spatial
condition maps (canny/hed/depth/normal/semantic) that are appended to the
UNet input channels via a small conv downsampler (consumed at
openaimodel.py:284-298,433-435 == UNetConfig.additional_in_channels here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.schedules import fourier_embed
from . import initializers as init


# ---------------------------------------------------------------------------
# keypoint grounding tokenizer (17 COCO keypoints per person)


def position_net_keypoint(p, points, masks, max_persons: int, out_dim: int,
                          fourier_freqs: int = 8):
    """points: (B, max_persons*17, 2) normalized xy; masks: (B, max_persons*17)."""
    b = points.shape[0]
    m = masks[..., None].astype(jnp.float32)

    person = jnp.repeat(p["person_embeddings"], 17, axis=0)       # (P*17, C)
    keypoint = jnp.tile(p["keypoint_embeddings"], (max_persons, 1))
    person = (person + keypoint)[None].repeat(b, axis=0)

    xy = fourier_embed(points, num_freqs=fourier_freqs)
    person = person * m + (1 - m) * p["null_person_feature"].reshape(1, 1, -1)
    xy = xy * m + (1 - m) * p["null_xy_feature"].reshape(1, 1, -1)

    h = jnp.concatenate([person, xy], axis=-1)
    h = nn.silu(nn.linear(p["linears"]["0"], h))
    h = nn.silu(nn.linear(p["linears"]["2"], h))
    return nn.linear(p["linears"]["4"], h)


def init_position_net_keypoint(key, max_persons: int, out_dim: int,
                               fourier_freqs: int = 8):
    position_dim = fourier_freqs * 2 * 2
    ks = jax.random.split(key, 3)
    return {
        "person_embeddings": init.zeros_p((max_persons, out_dim)),
        "keypoint_embeddings": init.zeros_p((17, out_dim)),
        "linears": {
            "0": init.linear_p(ks[0], out_dim + position_dim, 512),
            "2": init.linear_p(ks[1], 512, 512),
            "4": init.linear_p(ks[2], 512, out_dim),
        },
        "null_person_feature": init.zeros_p((out_dim,)),
        "null_xy_feature": init.zeros_p((position_dim,)),
    }


# ---------------------------------------------------------------------------
# condition-map grounding tokenizer (canny/hed/depth/normal/sem):
# ConvNeXt-tiny over the map -> 196 spatial tokens (+ BERT-style pos emb)
# (canny_grounding_net.py:12-62)


def position_net_map(p, cond_map, mask, resize_input: int = 448):
    """cond_map: (B, H, W, 3) in [0,1]; mask: (B,) 0/1 validity per sample."""
    from .convnext import ConvNeXtConfig, convnext_features

    b = cond_map.shape[0]
    x = jax.image.resize(cond_map, (b, resize_input, resize_input, cond_map.shape[-1]),
                         "bilinear")
    feats = convnext_features(p["convnext_tiny_backbone"], ConvNeXtConfig(), x)
    num_tokens = feats.shape[1] * feats.shape[2]
    objs = feats.reshape(b, num_tokens, -1)

    m = mask.reshape(-1, 1, 1).astype(objs.dtype)
    null = p["null_feature"].reshape(1, 1, -1).astype(objs.dtype)
    objs = objs * m + null * (1 - m)
    objs = objs + p["pos_embedding"].astype(objs.dtype)

    h = nn.silu(nn.linear(p["linears"]["0"], objs))
    h = nn.silu(nn.linear(p["linears"]["2"], h))
    return nn.linear(p["linears"]["4"], h)


def init_position_net_map(key, out_dim: int = 768, resize_input: int = 448):
    from .convnext import ConvNeXtConfig, init_convnext_params

    num_tokens = (resize_input // 32) ** 2
    feat_dim = 768
    ks = jax.random.split(key, 5)
    return {
        "convnext_tiny_backbone": init_convnext_params(ks[0], ConvNeXtConfig()),
        "pos_embedding": init.normal_p(ks[1], (1, num_tokens, feat_dim), 0.02),
        "linears": {
            "0": init.linear_p(ks[2], feat_dim, 512),
            "2": init.linear_p(ks[3], 512, 512),
            "4": init.linear_p(ks[4], 512, out_dim),
        },
        "null_feature": init.zeros_p((feat_dim,)),
    }


# ---------------------------------------------------------------------------
# condition-map downsampler: map -> extra UNet input channels


def grounding_downsampler(p, cond_map, resize_input: int = 256):
    """cond_map: (B, H, W, C>=1) in [0,1]; uses channel 0 (maps are grayscale
    replicated to rgb in the datasets). Output: (B, resize/4, resize/4, out)."""
    b = cond_map.shape[0]
    x = cond_map[..., :1]
    x = jax.image.resize(x, (b, resize_input, resize_input, 1), "bicubic")
    x = nn.conv2d(p["layers"]["0"], x, stride=2, padding=1)
    x = nn.silu(x)
    x = nn.conv2d(p["layers"]["2"], x, stride=2, padding=1)
    return x


def init_grounding_downsampler(key, out_dim: int = 8):
    k1, k2 = jax.random.split(key)
    return {
        "layers": {
            "0": init.conv_p(k1, 4, 4, 1, 4),
            "2": init.conv_p(k2, 4, 4, 4, out_dim),
        }
    }
