"""CLIP ViT image encoder in pure JAX (for the RL reward and CLIPScore eval).

Mirrors HF CLIPVisionModel (+ visual_projection): patch conv, class token,
learned position embeddings, pre-LN ViT (no causal mask), post-layernorm on
the class token, linear projection to the shared space. Param tree follows
the HF ``vision_model.*`` nesting; get_image_features == projection(pooled).

The reference consumes this through transformers CLIPModel
(models/policy.py:36-138, GLIGEN/clip_score.py).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import nn
from . import initializers as init
from .clip_text import quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_IMAGE_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
CLIP_IMAGE_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


def preprocess_images(images, cfg: CLIPVisionConfig):
    """(B, H, W, 3) float in [0, 1] -> normalized (B, 224, 224, 3)."""
    b = images.shape[0]
    x = jax.image.resize(images, (b, cfg.image_size, cfg.image_size, 3), "bicubic")
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


def _attn(p, x, num_heads: int):
    b, n, c = x.shape
    hd = c // num_heads
    q = nn.linear(p["q_proj"], x) * (hd ** -0.5)
    k = nn.linear(p["k_proj"], x)
    v = nn.linear(p["v_proj"], x)
    qh = q.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, num_heads, hd).transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhnc,bhmc->bhnm", qh, kh, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmc->bhnc", attn, vh)
    return nn.linear(p["out_proj"], out.transpose(0, 2, 1, 3).reshape(b, n, c))


def clip_vision_apply(params, cfg: CLIPVisionConfig, pixel_values):
    """pixel_values: (B, 224, 224, 3) normalized. Returns (hidden, pooled)."""
    vm = params["vision_model"]
    emb = vm["embeddings"]
    b = pixel_values.shape[0]
    patches = nn.conv2d(
        {"weight": emb["patch_embedding"]["weight"]},
        pixel_values, stride=cfg.patch_size, padding=0,
    )  # (B, 16, 16, C)
    patches = patches.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(emb["class_embedding"].reshape(1, 1, -1),
                           (b, 1, cfg.hidden_size)).astype(patches.dtype)
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + emb["position_embedding"]["weight"][None, : x.shape[1]]
    x = nn.layer_norm(vm["pre_layrnorm"], x, cfg.layer_norm_eps)
    for i in range(cfg.num_layers):
        lyr = vm["encoder"]["layers"][str(i)]
        x = x + _attn(lyr["self_attn"],
                      nn.layer_norm(lyr["layer_norm1"], x, cfg.layer_norm_eps),
                      cfg.num_heads)
        h = nn.layer_norm(lyr["layer_norm2"], x, cfg.layer_norm_eps)
        h = nn.linear(lyr["mlp"]["fc2"], quick_gelu(nn.linear(lyr["mlp"]["fc1"], h)))
        x = x + h
    pooled = nn.layer_norm(vm["post_layernorm"], x[:, 0], cfg.layer_norm_eps)
    return x, pooled


def clip_image_features(params, cfg: CLIPVisionConfig, pixel_values):
    """CLIPModel.get_image_features: projection of the pooled class token."""
    _, pooled = clip_vision_apply(params, cfg, pixel_values)
    return nn.linear(params["visual_projection"], pooled)


def init_clip_vision_params(key, cfg: CLIPVisionConfig):
    keys = iter(jax.random.split(key, 8 + cfg.num_layers * 8))
    c, inter = cfg.hidden_size, cfg.intermediate_size
    layers = {}
    for i in range(cfg.num_layers):
        layers[str(i)] = {
            "self_attn": {
                "q_proj": init.linear_p(next(keys), c, c),
                "k_proj": init.linear_p(next(keys), c, c),
                "v_proj": init.linear_p(next(keys), c, c),
                "out_proj": init.linear_p(next(keys), c, c),
            },
            "layer_norm1": init.norm_p(c),
            "layer_norm2": init.norm_p(c),
            "mlp": {
                "fc1": init.linear_p(next(keys), c, inter),
                "fc2": init.linear_p(next(keys), inter, c),
            },
        }
    return {
        "vision_model": {
            "embeddings": {
                "class_embedding": init.normal_p(next(keys), (c,), 0.02),
                "patch_embedding": {
                    "weight": init.normal_p(
                        next(keys), (cfg.patch_size, cfg.patch_size, 3, c), 0.02),
                },
                "position_embedding": {
                    "weight": init.normal_p(next(keys), (cfg.num_patches + 1, c), 0.02),
                },
            },
            "pre_layrnorm": init.norm_p(c),
            "encoder": {"layers": layers},
            "post_layernorm": init.norm_p(c),
        },
        "visual_projection": init.linear_p(next(keys), c, cfg.projection_dim, bias=False),
    }
