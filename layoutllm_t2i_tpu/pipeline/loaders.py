"""Model-bundle loaders: converted GLIGEN .pth or random-init for smoke runs.

interface.py:366-374 equivalent; the checkpoint-embedded config is the source
of truth for model construction.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.clip_text import CLIPTextConfig, init_clip_text_params
from ..models.clip_tokenizer import default_tokenizer
from ..models.unet import UNetConfig, init_unet_params
from ..models.vae import VAEConfig, init_vae_params
from ..ops.schedules import make_ddpm_schedule
from ..utils.trees import cast_floating, jitted_init
from .inference import GligenModels


def _dataclass_from_dict(cls, d: dict):
    """Construct ``cls`` from a dict, keeping only known fields (forward
    compat with configs written by newer trainers) and re-tupling lists
    (dataclasses.asdict turns tuples into lists; configs are hashed as jit
    statics so they must round-trip hashable)."""
    import dataclasses

    fields = {f.name: f for f in dataclasses.fields(cls)}
    kw = {}
    for k, v in d.items():
        if k in fields:
            kw[k] = tuple(v) if isinstance(v, list) else v
    return cls(**kw)


def _unet_cfg_from_config_dict(config: Optional[dict]) -> UNetConfig:
    # our own trainer embeds the full dataclass (diffusion_trainer.save_ckpt)
    if isinstance(config, dict) and isinstance(config.get("unet_cfg"), dict):
        return _dataclass_from_dict(UNetConfig, config["unet_cfg"])
    try:
        p = config["model"]["params"]
        return UNetConfig(
            image_size=p.get("image_size", 64),
            in_channels=p.get("in_channels", 4),
            model_channels=p.get("model_channels", 320),
            out_channels=p.get("out_channels", 4),
            num_res_blocks=p.get("num_res_blocks", 2),
            attention_resolutions=tuple(p.get("attention_resolutions", (4, 2, 1))),
            channel_mult=tuple(p.get("channel_mult", (1, 2, 4, 4))),
            num_heads=p.get("num_heads", 8),
            transformer_depth=p.get("transformer_depth", 1),
            context_dim=p.get("context_dim", 768),
            fuser_type=p.get("fuser_type", "gatedSA"),
            inpaint_mode=p.get("inpaint_mode", False),
        )
    except (KeyError, TypeError):
        return UNetConfig()


def _schedule_from_config_dict(config: Optional[dict]):
    try:
        p = config["diffusion"]["params"]
        return make_ddpm_schedule(
            "linear", p.get("timesteps", 1000),
            p.get("linear_start", 0.00085), p.get("linear_end", 0.012),
        )
    except (KeyError, TypeError):
        return make_ddpm_schedule("linear", 1000, 0.00085, 0.012)


def load_models_from_gligen_ckpt(ckpt_path: str, sd_first_conv_path: Optional[str] = None,
                                 dtype=None, tokenizer=None) -> GligenModels:
    from ..checkpoint.convert import load_gligen_checkpoint, load_sd_first_conv

    params, config, _ = load_gligen_checkpoint(ckpt_path)
    dtype = dtype or (jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32)
    sd_conv = load_sd_first_conv(sd_first_conv_path) if sd_first_conv_path else None
    if sd_conv is not None:
        sd_conv = jax.tree.map(jax.device_put, sd_conv)

    def _dev(tree):
        # converted ckpts arrive as HOST numpy arrays; without an up-front
        # uncommitted device_put every jitted dispatch re-transfers the full
        # weight tree (measured 3.2x throughput loss through the axon tunnel
        # at SD scale: 0.317 vs 1.003 img/s, PERF.md r5 structured-weights
        # gate). random_models never hits this (jitted_init outputs live on
        # device). device_put with no device keeps arrays uncommitted so the
        # sharded/TP paths can still reshard them.
        return jax.tree.map(jax.device_put, cast_floating(tree, dtype))

    # reference GLIGEN ckpts always pair SD's full-size CLIP/VAE (defaults);
    # our own trainer's exports embed the exact module configs, so non-default
    # geometries (--small smoke ckpts) round-trip too
    vae_cfg = (_dataclass_from_dict(VAEConfig, config["vae_cfg"])
               if isinstance(config, dict) and isinstance(config.get("vae_cfg"), dict)
               else VAEConfig())
    clip_cfg = (_dataclass_from_dict(CLIPTextConfig, config["clip_cfg"])
                if isinstance(config, dict) and isinstance(config.get("clip_cfg"), dict)
                else CLIPTextConfig())
    return GligenModels(
        unet_cfg=_unet_cfg_from_config_dict(config),
        unet_params=_dev(params["unet"]),
        vae_cfg=vae_cfg,
        vae_params=_dev(params["vae"]),
        clip_cfg=clip_cfg,
        clip_params=_dev(params["clip_text"]),
        schedule=_schedule_from_config_dict(config),
        tokenizer=tokenizer or default_tokenizer(),
        sd_first_conv=sd_conv,
        compute_dtype=dtype,
    )


def random_models(seed: int = 0, dtype=None, small: bool = False) -> GligenModels:
    """Random-weight bundle for offline smoke/bench runs."""
    dtype = dtype or (jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32)
    if small:
        unet_cfg = UNetConfig(image_size=8, model_channels=32, num_res_blocks=1,
                              attention_resolutions=(2, 1), channel_mult=(1, 2),
                              num_heads=2)
        vae_cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1)
        clip_cfg = CLIPTextConfig(num_layers=2)
    else:
        unet_cfg, vae_cfg, clip_cfg = UNetConfig(), VAEConfig(), CLIPTextConfig()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return GligenModels(
        unet_cfg=unet_cfg,
        unet_params=jitted_init(init_unet_params, k1, unet_cfg, dtype),
        vae_cfg=vae_cfg,
        vae_params=jitted_init(init_vae_params, k2, vae_cfg, dtype),
        clip_cfg=clip_cfg,
        clip_params=jitted_init(init_clip_text_params, k3, clip_cfg, dtype),
        schedule=make_ddpm_schedule("linear", 1000, 0.00085, 0.012),
        tokenizer=default_tokenizer(),
        compute_dtype=dtype,
    )


def adapt_models_for_modality(models: GligenModels, modality: str,
                              seed: int = 0, downsampler_out: int = 8,
                              max_persons: int = 8) -> GligenModels:
    """Re-shape a box+text bundle for an upstream-GLIGEN modality
    (gligen_inference.py:199-342 dispatches per released ckpt; here the
    grounding tokenizer / downsampler / first conv are re-initialized when the
    loaded checkpoint doesn't carry them — real modality ckpts come through
    load_models_from_gligen_ckpt with these params already present).

    map modalities (canny/hed/depth/normal/sem): ConvNeXt token tokenizer +
    a conv downsampler whose output channels concat to the UNet input
    (additional_in_channels); keypoint: the 17-point person tokenizer. Both
    disable the relation layer (upstream GLIGEN ckpts have no rela_fuse)."""
    import dataclasses

    from ..models.grounding_extras import init_grounding_downsampler
    from ..models.unet import _init_position_net_for
    from ..models import initializers as minit

    map_modalities = ("canny", "hed", "depth", "normal", "sem")
    if modality in map_modalities:
        new_cfg = dataclasses.replace(
            models.unet_cfg, grounding_type="map",
            additional_in_channels=downsampler_out,
            use_relation_attention=False)
    elif modality == "keypoint":
        new_cfg = dataclasses.replace(
            models.unet_cfg, grounding_type="keypoint",
            max_persons_per_image=max_persons, use_relation_attention=False)
    elif modality == "text_image":
        new_cfg = dataclasses.replace(
            models.unet_cfg, grounding_type="text_image",
            use_relation_attention=False)
    else:
        return models

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    params = dict(models.unet_params)
    if models.unet_cfg.grounding_type != new_cfg.grounding_type:
        params["position_net"] = _init_position_net_for(k1, new_cfg)
    if new_cfg.first_conv_in_channels != models.unet_cfg.first_conv_in_channels:
        inblocks = dict(params["input_blocks"])
        inblocks["0"] = {"0": minit.conv_p(
            k2, 3, 3, new_cfg.first_conv_in_channels, new_cfg.model_channels)}
        params["input_blocks"] = inblocks
    if modality in map_modalities and "downsample_net" not in params:
        params["downsample_net"] = init_grounding_downsampler(k3, downsampler_out)
    # the 4-channel SD first-conv restore cannot apply over extra channels;
    # modality runs keep grounding on for all steps (alpha [1,0,0])
    return dataclasses.replace(models, unet_cfg=new_cfg, unet_params=params,
                               sd_first_conv=None)


def quantize_unet_int8(models: GligenModels, min_size: int = 1 << 16) -> GligenModels:
    """Weight-only int8 UNet for the latency/serving path (ops/quant.py).

    Halves the per-step HBM weight traffic of the sampling scan — the
    dominant cost at batch 1, where the MXU is underutilized. VAE/CLIP stay
    dense (decode is ~3% of image cost and text encode runs once per
    request). Opt-in (bench/serve/txt2img ``--int8``); no reference
    counterpart (GLIGEN serves fp16 autocast only).
    """
    import dataclasses

    from ..ops.quant import quantize_params

    return dataclasses.replace(
        models, unet_params=quantize_params(models.unet_params, min_size))
