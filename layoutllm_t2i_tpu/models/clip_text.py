"""CLIP ViT-L/14 text encoder in pure JAX.

Replaces the reference's FrozenCLIPEmbedder (GLIGEN/ldm/modules/encoders/
modules.py:144-184, a HF CLIPTextModel) so the text path runs on-device with
no torch dependency. Param pytree mirrors the HF ``text_model.*`` state-dict
nesting; the converter maps the GLIGEN checkpoint's ``transformer.text_model.*``
keys onto it.

Semantics matched:
  * pre-LN transformer, causal mask, no padding mask (GLIGEN pads to 77 and
    never passes attention_mask);
  * quick_gelu activation (x * sigmoid(1.702 x));
  * pooled output = hidden state at each sequence's argmax(token_id), i.e.
    the end-of-text token (highest id in the vocab).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import nn
from . import initializers as init


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_length: int = 77
    layer_norm_eps: float = 1e-5


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


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
    causal = jnp.tril(jnp.ones((n, n), bool))
    sim = jnp.where(causal[None, None], sim, -1e30)
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bhmc->bhnc", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
    return nn.linear(p["out_proj"], out)


def clip_text_apply(params, cfg: CLIPTextConfig, input_ids):
    """input_ids: (B, 77) int32. Returns (last_hidden (B,77,C), pooled (B,C))."""
    b, n = input_ids.shape
    # params may be host numpy (materialize_params on CPU); jnp-wrap so a
    # traced input_ids can gather from the table
    tok = jnp.asarray(params["embeddings"]["token_embedding"]["weight"])[input_ids]
    pos = jnp.asarray(params["embeddings"]["position_embedding"]["weight"])[:n]
    x = tok + pos[None]
    for i in range(cfg.num_layers):
        lyr = params["encoder"]["layers"][str(i)]
        x = x + _attn(lyr["self_attn"], nn.layer_norm(lyr["layer_norm1"], x, cfg.layer_norm_eps),
                      cfg.num_heads)
        h = nn.layer_norm(lyr["layer_norm2"], x, cfg.layer_norm_eps)
        h = nn.linear(lyr["mlp"]["fc2"], quick_gelu(nn.linear(lyr["mlp"]["fc1"], h)))
        x = x + h
    x = nn.layer_norm(params["final_layer_norm"], x, cfg.layer_norm_eps)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = x[jnp.arange(b), eot]
    return x, pooled


def clip_text_features(params, cfg: CLIPTextConfig, input_ids):
    """CLIPModel.get_text_features: text_projection over the pooled output.
    Expects params['text_projection'] alongside the text_model tree (converted
    from the HF CLIPModel key 'text_projection.weight')."""
    _, pooled = clip_text_apply(params, cfg, input_ids)
    return nn.linear(params["text_projection"], pooled)


def init_clip_text_params(key, cfg: CLIPTextConfig):
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
        "embeddings": {
            "token_embedding": {
                "weight": init.normal_p(next(keys), (cfg.vocab_size, c), 0.02)
            },
            "position_embedding": {
                "weight": init.normal_p(next(keys), (cfg.max_length, c), 0.01)
            },
        },
        "encoder": {"layers": layers},
        "final_layer_norm": init.norm_p(c),
    }
