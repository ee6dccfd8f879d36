"""AutoencoderKL (SD f8/z4 VAE) as pure functions.

Reference: GLIGEN/ldm/models/autoencoder.py:17-44 and
GLIGEN/ldm/modules/diffusionmodules/model.py (Encoder:368, Decoder:462,
ResnetBlock:82, AttnBlock:150, asymmetric-padding Downsample:60-79).
Param pytree mirrors the torch state_dict; activations NHWC. All norms are
GroupNorm(32, eps=1e-6) with float32 statistics.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.attention import multi_head_attention
from . import initializers as init


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    embed_dim: int = 4
    z_channels: int = 4
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    out_ch: int = 3
    scale_factor: float = 0.18215
    double_z: bool = True


def _gn(p, x, silu: bool = False):
    return nn.group_norm(p, x, num_groups=32, eps=1e-6, silu=silu)


def resnet_block(p, x):
    h = nn.conv2d(p["conv1"], _gn(p["norm1"], x, silu=True))
    h = nn.conv2d(p["conv2"], _gn(p["norm2"], h, silu=True))
    if "nin_shortcut" in p:
        x = nn.conv2d(p["nin_shortcut"], x, padding=0)
    return x + h


def init_resnet_block(key, cin, cout):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": init.norm_p(cin),
        "conv1": init.conv_p(ks[0], 3, 3, cin, cout),
        "norm2": init.norm_p(cout),
        "conv2": init.conv_p(ks[1], 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = init.conv_p(ks[2], 1, 1, cin, cout)
    return p


def attn_block(p, x):
    """Single-head spatial self-attention (model.py:150-202)."""
    b, h, w, c = x.shape
    hn = _gn(p["norm"], x)
    q = nn.conv2d(p["q"], hn, padding=0).reshape(b, h * w, c)
    k = nn.conv2d(p["k"], hn, padding=0).reshape(b, h * w, c)
    v = nn.conv2d(p["v"], hn, padding=0).reshape(b, h * w, c)
    out = multi_head_attention(q, k, v, num_heads=1)
    out = nn.conv2d(p["proj_out"], out.reshape(b, h, w, c), padding=0)
    return x + out


def init_attn_block(key, c):
    ks = jax.random.split(key, 4)
    return {
        "norm": init.norm_p(c),
        "q": init.conv_p(ks[0], 1, 1, c, c),
        "k": init.conv_p(ks[1], 1, 1, c, c),
        "v": init.conv_p(ks[2], 1, 1, c, c),
        "proj_out": init.conv_p(ks[3], 1, 1, c, c),
    }


def vae_downsample(p, x):
    # torch pads (left=0, right=1, top=0, bottom=1) then stride-2 valid conv
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return nn.conv2d(p["conv"], x, stride=2, padding=0)


def vae_upsample(p, x):
    return nn.conv2d(p["conv"], nn.nearest_upsample_2x(x), padding=1)


# ---------------------------------------------------------------------------


def encoder_apply(p, cfg: VAEConfig, x):
    h = nn.conv2d(p["conv_in"], x)
    for i_level in range(len(cfg.ch_mult)):
        lvl = p["down"][str(i_level)]
        for i_block in range(cfg.num_res_blocks):
            h = resnet_block(lvl["block"][str(i_block)], h)
        if i_level != len(cfg.ch_mult) - 1:
            h = vae_downsample(lvl["downsample"], h)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    h = nn.conv2d(p["conv_out"], _gn(p["norm_out"], h, silu=True))
    return h


def decoder_apply(p, cfg: VAEConfig, z):
    h = nn.conv2d(p["conv_in"], z)
    h = resnet_block(p["mid"]["block_1"], h)
    h = attn_block(p["mid"]["attn_1"], h)
    h = resnet_block(p["mid"]["block_2"], h)
    for i_level in reversed(range(len(cfg.ch_mult))):
        lvl = p["up"][str(i_level)]
        for i_block in range(cfg.num_res_blocks + 1):
            h = resnet_block(lvl["block"][str(i_block)], h)
        if i_level != 0:
            h = vae_upsample(lvl["upsample"], h)
    h = nn.conv2d(p["conv_out"], _gn(p["norm_out"], h, silu=True))
    return h


def encode(params, cfg: VAEConfig, x, rng=None, sample: bool = True):
    """Image (B,H,W,3) in [-1,1] -> scaled latent (B,H/8,W/8,4).

    ``sample=False`` returns the posterior mean (DiagonalGaussian mode).
    """
    moments = encoder_apply(params["encoder"], cfg, x)
    moments = nn.conv2d(params["quant_conv"], moments, padding=0)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if sample:
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar)
        noise = jax.random.normal(rng, mean.shape, mean.dtype)
        z = mean + std * noise
    else:
        z = mean
    return z * cfg.scale_factor


def decode(params, cfg: VAEConfig, z):
    z = z / cfg.scale_factor
    z = nn.conv2d(params["post_quant_conv"], z, padding=0)
    return decoder_apply(params["decoder"], cfg, z)


def init_vae_params(key, cfg: VAEConfig):
    keys = iter(jax.random.split(key, 128))
    in_ch_mult = (1,) + tuple(cfg.ch_mult)

    down = {}
    block_in = cfg.ch
    for i_level in range(len(cfg.ch_mult)):
        block_in = cfg.ch * in_ch_mult[i_level]
        block_out = cfg.ch * cfg.ch_mult[i_level]
        blocks = {}
        for i_block in range(cfg.num_res_blocks):
            blocks[str(i_block)] = init_resnet_block(next(keys), block_in, block_out)
            block_in = block_out
        lvl = {"block": blocks}
        if i_level != len(cfg.ch_mult) - 1:
            lvl["downsample"] = {"conv": init.conv_p(next(keys), 3, 3, block_in, block_in)}
        down[str(i_level)] = lvl

    z2 = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    encoder = {
        "conv_in": init.conv_p(next(keys), 3, 3, cfg.in_channels, cfg.ch),
        "down": down,
        "mid": {
            "block_1": init_resnet_block(next(keys), block_in, block_in),
            "attn_1": init_attn_block(next(keys), block_in),
            "block_2": init_resnet_block(next(keys), block_in, block_in),
        },
        "norm_out": init.norm_p(block_in),
        "conv_out": init.conv_p(next(keys), 3, 3, block_in, z2),
    }

    block_in = cfg.ch * cfg.ch_mult[-1]
    up = {}
    dec_block_in = block_in
    for i_level in reversed(range(len(cfg.ch_mult))):
        block_out = cfg.ch * cfg.ch_mult[i_level]
        blocks = {}
        for i_block in range(cfg.num_res_blocks + 1):
            blocks[str(i_block)] = init_resnet_block(next(keys), dec_block_in, block_out)
            dec_block_in = block_out
        lvl = {"block": blocks}
        if i_level != 0:
            lvl["upsample"] = {"conv": init.conv_p(next(keys), 3, 3, dec_block_in, dec_block_in)}
        up[str(i_level)] = lvl

    decoder = {
        "conv_in": init.conv_p(next(keys), 3, 3, cfg.z_channels, block_in),
        "mid": {
            "block_1": init_resnet_block(next(keys), block_in, block_in),
            "attn_1": init_attn_block(next(keys), block_in),
            "block_2": init_resnet_block(next(keys), block_in, block_in),
        },
        "up": up,
        "norm_out": init.norm_p(dec_block_in),
        "conv_out": init.conv_p(next(keys), 3, 3, dec_block_in, cfg.out_ch),
    }

    return {
        "encoder": encoder,
        "decoder": decoder,
        "quant_conv": init.conv_p(next(keys), 1, 1, z2, 2 * cfg.embed_dim),
        "post_quant_conv": init.conv_p(next(keys), 1, 1, cfg.embed_dim, cfg.z_channels),
    }
