"""ConvNeXt backbone (tiny by default) as pure functions over pytrees.

Reference: GLIGEN/ldm/modules/diffusionmodules/convnext.py (the map-grounding
PositionNets run a ConvNeXt-tiny over the condition map and take the final
(B, 768, H/32, W/32) feature map — canny_grounding_net.py:20,44). Param tree
mirrors the torch names (downsample_layers.{i}.{0,1}, stages.{i}.{j}.dwconv/
norm/pwconv1/pwconv2/gamma) so official checkpoints convert mechanically.
NHWC activations; LayerNorm over channels.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import nn
from . import initializers as init


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    in_chans: int = 3
    layer_scale_init: float = 1e-6


def _depthwise_conv7(p, x):
    dim = x.shape[-1]
    y = lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (1, 1), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=dim,
    )
    return y + p["bias"].astype(x.dtype)


def _block(p, x):
    inp = x
    x = _depthwise_conv7(p["dwconv"], x)
    x = nn.layer_norm(p["norm"], x, eps=1e-6)
    x = nn.linear(p["pwconv1"], x)
    x = nn.gelu(x)
    x = nn.linear(p["pwconv2"], x)
    if "gamma" in p:
        x = p["gamma"].astype(x.dtype) * x
    return inp + x


def convnext_features(params, cfg: ConvNeXtConfig, x):
    """x: (B, H, W, 3) -> final stage features (B, H/32, W/32, dims[-1])."""
    for i in range(4):
        ds = params["downsample_layers"][str(i)]
        if i == 0:
            x = nn.conv2d(ds["0"], x, stride=4, padding=0)
            x = nn.layer_norm(ds["1"], x, eps=1e-6)
        else:
            x = nn.layer_norm(ds["0"], x, eps=1e-6)
            x = nn.conv2d(ds["1"], x, stride=2, padding=0)
        for j in range(cfg.depths[i]):
            x = _block(params["stages"][str(i)][str(j)], x)
    return x


def init_convnext_params(key, cfg: ConvNeXtConfig):
    keys = iter(jax.random.split(key, 4 + sum(cfg.depths) * 4))
    downs = {}
    for i in range(4):
        if i == 0:
            downs["0"] = {
                "0": init.conv_p(next(keys), 4, 4, cfg.in_chans, cfg.dims[0]),
                "1": init.norm_p(cfg.dims[0]),
            }
        else:
            downs[str(i)] = {
                "0": init.norm_p(cfg.dims[i - 1]),
                "1": init.conv_p(next(keys), 2, 2, cfg.dims[i - 1], cfg.dims[i]),
            }
    stages = {}
    for i in range(4):
        dim = cfg.dims[i]
        blocks = {}
        for j in range(cfg.depths[i]):
            dw = init.conv_p(next(keys), 7, 7, 1, dim)  # depthwise: I=1
            blocks[str(j)] = {
                "dwconv": dw,
                "norm": init.norm_p(dim),
                "pwconv1": init.linear_p(next(keys), dim, 4 * dim),
                "pwconv2": init.linear_p(next(keys), 4 * dim, dim),
                "gamma": init.zeros_p((dim,)) + cfg.layer_scale_init,
            }
        stages[str(i)] = blocks
    return {"downsample_layers": downs, "stages": stages}
