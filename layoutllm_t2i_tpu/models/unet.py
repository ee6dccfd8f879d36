"""Relation-aware GLIGEN UNet (SD-1.x skeleton) as a pure function.

Reference: GLIGEN/ldm/modules/diffusionmodules/openaimodel.py:234-459. The
param pytree mirrors the torch state_dict nesting (input_blocks.1.0.in_layers
...), activations are NHWC, and the grounding/relation conditioning threads
through every SpatialTransformer. Host-side behaviors of the reference are
replaced with traced inputs:

  * ``fuser_scale`` — the per-step grounding alpha (reference mutates every
    gated module via set_alpha_scale, txt2img.py:46);
  * first-conv restore at alpha==0 (openaimodel.py:393-408) — the sampler
    selects between GLIGEN and SD first-conv weights with a where() before
    calling this function;
  * grounding drop for CFG training — the trainer zeroes the grounding inputs
    instead of swapping to a null-input object.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import nn
from ..ops.schedules import timestep_embedding
from . import initializers as init
from .blocks import spatial_transformer, init_spatial_transformer
from .position_net import (
    position_net, init_position_net,
    position_net_text_image, init_position_net_text_image,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    image_size: int = 64
    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    fuser_type: str = "gatedSA"
    inpaint_mode: bool = False
    # extra input channels concatenated by a grounding downsampler
    additional_in_channels: int = 0
    grounding_in_dim: int = 768
    grounding_out_dim: int = 768
    # LayoutLLM-T2I's relation-aware layer; False = vanilla GLIGEN UNet
    # (openaimodel_original.py — no rela_fuse params)
    use_relation_attention: bool = True
    # grounding tokenizer family: text | text_image | keypoint
    grounding_type: str = "text"
    max_persons_per_image: int = 8  # keypoint mode only

    @property
    def first_conv_in_channels(self) -> int:
        in_c = self.in_channels + self.additional_in_channels
        if self.inpaint_mode:
            in_c += self.in_channels + 1
        return in_c

    @property
    def first_conv_restorable(self) -> bool:
        return not self.inpaint_mode


def input_block_specs(cfg: UNetConfig):
    """Mirror of the torch constructor loop (openaimodel.py:306-332).

    Returns a list over input_blocks index of (kind, ch_in, ch_out, ds) where
    kind is 'conv' | 'res' | 'res_st' | 'down'.
    """
    specs = [("conv", cfg.first_conv_in_channels, cfg.model_channels, 1)]
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            out_ch = mult * cfg.model_channels
            kind = "res_st" if ds in cfg.attention_resolutions else "res"
            specs.append((kind, ch, out_ch, ds))
            ch = out_ch
        if level != len(cfg.channel_mult) - 1:
            specs.append(("down", ch, ch, ds))
            ds *= 2
    return specs


def output_block_specs(cfg: UNetConfig):
    """Mirror of openaimodel.py:357-380. Returns a list of
    (kind, ch_in, skip_ch, ch_out, upsample, ds)."""
    # rebuild input_block_chans
    chans = [cfg.model_channels]
    ch = cfg.model_channels
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            ch = mult * cfg.model_channels
            chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            chans.append(ch)
            ds *= 2
    specs = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            out_ch = cfg.model_channels * mult
            kind = "res_st" if ds in cfg.attention_resolutions else "res"
            upsample = bool(level and i == cfg.num_res_blocks)
            specs.append((kind, ch + ich, ich, out_ch, upsample, ds))
            ch = out_ch
            if upsample:
                ds //= 2
    return specs


# ---------------------------------------------------------------------------
# res block (openaimodel.py:117-231, use_scale_shift_norm=False)


def res_block(p, x, emb):
    h = nn.group_norm(p["in_layers"]["0"], x, silu=True)
    h = nn.conv2d(p["in_layers"]["2"], h)
    emb_out = nn.linear(p["emb_layers"]["1"], nn.silu(emb))
    h = h + emb_out[:, None, None, :].astype(h.dtype)
    h = nn.group_norm(p["out_layers"]["0"], h, silu=True)
    h = nn.conv2d(p["out_layers"]["3"], h)
    if "skip_connection" in p:
        x = nn.conv2d(p["skip_connection"], x, padding=0)
    return x + h


def init_res_block(key, ch_in, ch_out, emb_ch):
    ks = jax.random.split(key, 4)
    p = {
        "in_layers": {"0": init.norm_p(ch_in), "2": init.conv_p(ks[0], 3, 3, ch_in, ch_out)},
        "emb_layers": {"1": init.linear_p(ks[1], emb_ch, ch_out)},
        "out_layers": {"0": init.norm_p(ch_out), "3": init.conv_p(ks[2], 3, 3, ch_out, ch_out)},
    }
    if ch_in != ch_out:
        p["skip_connection"] = init.conv_p(ks[3], 1, 1, ch_in, ch_out)
    return p


def downsample(p, x):
    return nn.conv2d(p["op"], x, stride=2, padding=1)


def upsample(p, x):
    return nn.conv2d(p["conv"], nn.nearest_upsample_2x(x), padding=1)


# ---------------------------------------------------------------------------
# full UNet


def _init_position_net_for(key, cfg: UNetConfig):
    if cfg.grounding_type == "text":
        return init_position_net(key, cfg.grounding_in_dim, cfg.grounding_out_dim)
    if cfg.grounding_type == "text_image":
        return init_position_net_text_image(key, cfg.grounding_in_dim,
                                            cfg.grounding_out_dim)
    if cfg.grounding_type == "keypoint":
        from .grounding_extras import init_position_net_keypoint

        return init_position_net_keypoint(key, cfg.max_persons_per_image,
                                          cfg.grounding_out_dim)
    if cfg.grounding_type == "map":
        from .grounding_extras import init_position_net_map

        return init_position_net_map(key, cfg.grounding_out_dim)
    raise ValueError(f"unknown grounding_type {cfg.grounding_type}")


def _apply_position_net(params, cfg: UNetConfig, boxes, masks,
                        positive_embeddings, extra_grounding):
    if cfg.grounding_type == "text":
        return position_net(params, boxes, masks, positive_embeddings)
    if cfg.grounding_type == "text_image":
        eg = extra_grounding or {}
        return position_net_text_image(
            params, boxes, masks, eg["text_masks"], eg["image_masks"],
            positive_embeddings, eg["image_embeddings"],
        )
    if cfg.grounding_type == "keypoint":
        from .grounding_extras import position_net_keypoint

        # boxes carries the (B, P*17, 2) keypoint coordinates in this mode
        return position_net_keypoint(params, boxes, masks,
                                     cfg.max_persons_per_image,
                                     cfg.grounding_out_dim)
    if cfg.grounding_type == "map":
        from .grounding_extras import position_net_map

        # canny/hed/depth/normal/sem: ConvNeXt tokens over the condition map
        eg = extra_grounding or {}
        return position_net_map(params, eg["cond_map"], eg["map_mask"])
    raise ValueError(f"unknown grounding_type {cfg.grounding_type}")


def init_unet_params(key, cfg: UNetConfig):
    emb_ch = cfg.model_channels * 4
    keys = iter(jax.random.split(key, 256))
    params = {
        "time_embed": {
            "0": init.linear_p(next(keys), cfg.model_channels, emb_ch),
            "2": init.linear_p(next(keys), emb_ch, emb_ch),
        },
        "position_net": _init_position_net_for(next(keys), cfg),
    }

    d_head = lambda ch: ch // cfg.num_heads
    inblocks = {}
    for idx, (kind, ci, co, _ds) in enumerate(input_block_specs(cfg)):
        blk = {}
        if kind == "conv":
            blk["0"] = init.conv_p(next(keys), 3, 3, ci, co)
        elif kind == "down":
            blk["0"] = {"op": init.conv_p(next(keys), 3, 3, ci, co)}
        else:
            blk["0"] = init_res_block(next(keys), ci, co, emb_ch)
            if kind == "res_st":
                blk["1"] = init_spatial_transformer(
                    next(keys), co, cfg.context_dim, cfg.context_dim,
                    cfg.num_heads, d_head(co), cfg.transformer_depth, cfg.fuser_type,
                    cfg.use_relation_attention,
                )
        inblocks[str(idx)] = blk
    params["input_blocks"] = inblocks

    mid_ch = cfg.model_channels * cfg.channel_mult[-1]
    params["middle_block"] = {
        "0": init_res_block(next(keys), mid_ch, mid_ch, emb_ch),
        "1": init_spatial_transformer(
            next(keys), mid_ch, cfg.context_dim, cfg.context_dim, cfg.num_heads,
            d_head(mid_ch), cfg.transformer_depth, cfg.fuser_type,
            cfg.use_relation_attention,
        ),
        "2": init_res_block(next(keys), mid_ch, mid_ch, emb_ch),
    }

    outblocks = {}
    for idx, (kind, ci, _skip, co, up, _ds) in enumerate(output_block_specs(cfg)):
        blk = {"0": init_res_block(next(keys), ci, co, emb_ch)}
        nxt = 1
        if kind == "res_st":
            blk[str(nxt)] = init_spatial_transformer(
                next(keys), co, cfg.context_dim, cfg.context_dim, cfg.num_heads,
                d_head(co), cfg.transformer_depth, cfg.fuser_type,
                cfg.use_relation_attention,
            )
            nxt += 1
        if up:
            blk[str(nxt)] = {"conv": init.conv_p(next(keys), 3, 3, co, co)}
        outblocks[str(idx)] = blk
    params["output_blocks"] = outblocks

    params["out"] = {
        "0": init.norm_p(cfg.model_channels),
        "2": init.conv_p(next(keys), 3, 3, cfg.model_channels, cfg.out_channels),
    }
    return params


def unet_apply(
    params,
    cfg: UNetConfig,
    x,                       # (B, H, W, C) noisy latent, NHWC
    timesteps,               # (B,) int
    context,                 # (B, 77, context_dim) text tokens
    boxes,                   # (B, MO, 4) xyxy normalized
    masks,                   # (B, MO)
    positive_embeddings,     # (B, MO, grounding_in_dim)
    relations,               # (B, R, context_dim)
    fuser_scale=1.0,
    inpainting_extra: Optional[jnp.ndarray] = None,   # (B, H, W, C+1)
    grounding_extra: Optional[jnp.ndarray] = None,    # pre-downsampled channels
    attn_impl: str = "auto",
    extra_grounding: Optional[dict] = None,           # text_image mode inputs
    objs: Optional[jnp.ndarray] = None,               # precomputed grounding tokens
    skip_gated: bool = False,                         # static: fuser_scale == 0
    encoder_cache: Optional[dict] = None,             # propagated-step reuse
    return_encoder_cache: bool = False,
):
    """One eps-prediction forward (openaimodel.py:413-459).

    ``objs`` lets the sampler hoist the grounding tokens out of the step
    scan: they depend only on the (step-invariant) grounding inputs, yet the
    reference recomputes position_net per UNet call — for the ConvNeXt map
    tokenizer that is 100 backbone evals per 50-step CFG sample.

    Encoder propagation ("Faster Diffusion", arXiv:2312.09608; opt-in, no
    reference counterpart): encoder features drift slowly across adjacent
    sampling steps, so on non-key steps the entire input_blocks stack can be
    skipped and the cached skips reused — the decoder still sees the current
    timestep embedding and latent trajectory via the sampler update.
    ``return_encoder_cache=True`` additionally returns
    ``{"hs": tuple, "mid_in": h}``; ``encoder_cache`` (same structure) skips
    the encoder and consumes the cached features. Mutually exclusive."""
    if skip_gated:
        # grounding tokens feed only the gated fusers; with those statically
        # elided (fuser_scale == 0 steps) position_net is dead compute too
        objs = None
    elif objs is None:
        objs = _apply_position_net(params["position_net"], cfg, boxes, masks,
                                   positive_embeddings, extra_grounding)
    objs = None if objs is None else objs.astype(x.dtype)

    t_emb = timestep_embedding(timesteps, cfg.model_channels).astype(x.dtype)
    emb = nn.linear(params["time_embed"]["0"], t_emb)
    emb = nn.linear(params["time_embed"]["2"], nn.silu(emb))

    h = x
    if grounding_extra is not None:
        h = jnp.concatenate([h, grounding_extra.astype(h.dtype)], axis=-1)
    if cfg.inpaint_mode:
        assert inpainting_extra is not None
        h = jnp.concatenate([h, inpainting_extra.astype(h.dtype)], axis=-1)

    def run_st(p_st, h):
        return spatial_transformer(
            p_st, h, context, objs, relations, boxes, masks, cfg.num_heads,
            fuser_scale, cfg.fuser_type, cfg.transformer_depth, impl=attn_impl,
            use_rela=cfg.use_relation_attention, skip_gated=skip_gated,
        )

    if encoder_cache is not None:
        assert not return_encoder_cache
        hs = list(encoder_cache["hs"])
        h = encoder_cache["mid_in"]
    else:
        hs = []
        for idx, (kind, _ci, _co, _ds) in enumerate(input_block_specs(cfg)):
            blk = params["input_blocks"][str(idx)]
            if kind == "conv":
                h = nn.conv2d(blk["0"], h, padding=1)
            elif kind == "down":
                h = downsample(blk["0"], h)
            else:
                h = res_block(blk["0"], h, emb)
                if kind == "res_st":
                    h = run_st(blk["1"], h)
            hs.append(h)
    cache = {"hs": tuple(hs), "mid_in": h}

    mid = params["middle_block"]
    h = res_block(mid["0"], h, emb)
    h = run_st(mid["1"], h)
    h = res_block(mid["2"], h, emb)

    for idx, (kind, _ci, _skip, _co, up, _ds) in enumerate(output_block_specs(cfg)):
        blk = params["output_blocks"][str(idx)]
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        h = res_block(blk["0"], h, emb)
        nxt = 1
        if kind == "res_st":
            h = run_st(blk[str(nxt)], h)
            nxt += 1
        if up:
            h = upsample(blk[str(nxt)], h)

    h = nn.group_norm(params["out"]["0"], h, silu=True)
    h = nn.conv2d(params["out"]["2"], h)
    if return_encoder_cache:
        return h, cache
    return h
