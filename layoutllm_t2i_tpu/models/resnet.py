"""ResNet feature backbone for map grounding (capability surface).

Reference: GLIGEN/ldm/modules/diffusionmodules/resnet.py (337 LoC, a
torchvision-style ResNet whose forward returns the layer4 feature map —
N,512,7,7 for 224^2 input; the alternative to the ConvNeXt-tiny backbone in
the map grounding tokenizers). Param pytree mirrors the torchvision
state_dict (conv1 / bn1 / layer{1-4}.{i}.conv{1-3}/bn{1-3}/downsample) so
pretrained weights convert with checkpoint.convert.nest_state_dict.
BatchNorm runs in inference mode off the converted running stats.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import nn
from . import initializers as init


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    block: str = "basic"              # basic (18/34) | bottleneck (50/101/152)
    layers: Tuple[int, ...] = (2, 2, 2, 2)   # resnet18
    width: int = 64

    @property
    def expansion(self) -> int:
        return 1 if self.block == "basic" else 4

    @property
    def out_dim(self) -> int:
        return self.width * 8 * self.expansion


def _bn(p, x, eps=1e-5):
    mean = p["running_mean"].astype(jnp.float32)
    var = p["running_var"].astype(jnp.float32)
    y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _basic_block(p, x, stride: int):
    out = nn.conv2d(p["conv1"], x, stride=stride, padding=1)
    out = jax.nn.relu(_bn(p["bn1"], out))
    out = nn.conv2d(p["conv2"], out, padding=1)
    out = _bn(p["bn2"], out)
    identity = x
    if "downsample" in p:
        identity = _bn(p["downsample"]["1"],
                       nn.conv2d(p["downsample"]["0"], x, stride=stride,
                                 padding=0))
    return jax.nn.relu(out + identity)


def _bottleneck(p, x, stride: int):
    out = jax.nn.relu(_bn(p["bn1"], nn.conv2d(p["conv1"], x, padding=0)))
    out = jax.nn.relu(_bn(p["bn2"], nn.conv2d(p["conv2"], out, stride=stride,
                                              padding=1)))
    out = _bn(p["bn3"], nn.conv2d(p["conv3"], out, padding=0))
    identity = x
    if "downsample" in p:
        identity = _bn(p["downsample"]["1"],
                       nn.conv2d(p["downsample"]["0"], x, stride=stride,
                                 padding=0))
    return jax.nn.relu(out + identity)


def _maxpool3x3s2p1(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def resnet_features(params, cfg: ResNetConfig, x):
    """x: (B, H, W, 3) -> layer4 feature map (B, H/32, W/32, out_dim)."""
    block = _basic_block if cfg.block == "basic" else _bottleneck
    h = nn.conv2d(params["conv1"], x, stride=2, padding=3)
    h = jax.nn.relu(_bn(params["bn1"], h))
    h = _maxpool3x3s2p1(h)
    for li, n_blocks in enumerate(cfg.layers):
        layer = params[f"layer{li + 1}"]
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            h = block(layer[str(bi)], h, stride)
    return h


def _init_bn(c):
    return {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "running_mean": jnp.zeros((c,)), "running_var": jnp.ones((c,))}


def _init_conv(key, kh, kw, cin, cout):
    return {"weight": init.conv_p(key, kh, kw, cin, cout, bias=False)["weight"]}


def init_resnet_params(key, cfg: ResNetConfig):
    keys = iter(jax.random.split(key, 256))
    params = {
        "conv1": _init_conv(next(keys), 7, 7, 3, cfg.width),
        "bn1": _init_bn(cfg.width),
    }
    in_ch = cfg.width
    for li, n_blocks in enumerate(cfg.layers):
        planes = cfg.width * (2 ** li)
        out_ch = planes * cfg.expansion
        layer = {}
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            if cfg.block == "basic":
                blk = {
                    "conv1": _init_conv(next(keys), 3, 3, in_ch, planes),
                    "bn1": _init_bn(planes),
                    "conv2": _init_conv(next(keys), 3, 3, planes, planes),
                    "bn2": _init_bn(planes),
                }
            else:
                blk = {
                    "conv1": _init_conv(next(keys), 1, 1, in_ch, planes),
                    "bn1": _init_bn(planes),
                    "conv2": _init_conv(next(keys), 3, 3, planes, planes),
                    "bn2": _init_bn(planes),
                    "conv3": _init_conv(next(keys), 1, 1, planes, out_ch),
                    "bn3": _init_bn(out_ch),
                }
            if stride != 1 or in_ch != out_ch:
                blk["downsample"] = {
                    "0": _init_conv(next(keys), 1, 1, in_ch, out_ch),
                    "1": _init_bn(out_ch),
                }
            layer[str(bi)] = blk
            in_ch = out_ch
        params[f"layer{li + 1}"] = layer
    return params


# -- map grounding tokenizer over the ResNet backbone ------------------------


def position_net_map_resnet(p, cond_map, mask, resize_input: int = 448,
                            cfg: ResNetConfig = ResNetConfig()):
    """ResNet-backed variant of position_net_map (grounding_extras.py):
    layer4 tokens (+ pos emb) -> 3-layer MLP grounding tokens."""
    b = cond_map.shape[0]
    x = jax.image.resize(
        cond_map, (b, resize_input, resize_input, cond_map.shape[-1]),
        "bilinear")
    feats = resnet_features(p["resnet_backbone"], cfg, x)
    objs = feats.reshape(b, feats.shape[1] * feats.shape[2], -1)

    m = mask.reshape(-1, 1, 1).astype(objs.dtype)
    null = p["null_feature"].reshape(1, 1, -1).astype(objs.dtype)
    objs = objs * m + null * (1 - m)
    objs = objs + p["pos_embedding"].astype(objs.dtype)

    h = nn.silu(nn.linear(p["linears"]["0"], objs))
    h = nn.silu(nn.linear(p["linears"]["2"], h))
    return nn.linear(p["linears"]["4"], h)


def init_position_net_map_resnet(key, out_dim: int = 768,
                                 resize_input: int = 448,
                                 cfg: ResNetConfig = ResNetConfig()):
    num_tokens = (resize_input // 32) ** 2
    feat_dim = cfg.out_dim
    ks = jax.random.split(key, 5)
    return {
        "resnet_backbone": init_resnet_params(ks[0], cfg),
        "pos_embedding": init.normal_p(ks[1], (1, num_tokens, feat_dim), 0.02),
        "linears": {
            "0": init.linear_p(ks[2], feat_dim, 512),
            "2": init.linear_p(ks[3], 512, 512),
            "4": init.linear_p(ks[4], 512, out_dim),
        },
        "null_feature": init.zeros_p((feat_dim,)),
    }
