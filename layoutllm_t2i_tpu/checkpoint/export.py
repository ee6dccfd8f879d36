"""JAX pytree -> reference-format GLIGEN `.pth` checkpoint export.

Inverse of checkpoint/convert.py: emits the 4-module dict the reference
trainer saves (trainer_combined_layout.py:523-535) —
``{model, text_encoder, autoencoder, diffusion, iters, config_dict}`` — so a
checkpoint trained here can be consumed by reference tooling
(interface.py:79-101 load path). Layout translation back: conv HWIO -> OIHW,
linear (in,out) -> (out,in), embedding tables and <=1-D tensors unchanged.

torch is only imported at export time (host-side, CPU).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..ops.schedules import DDPMSchedule
from .convert import _EMBEDDING_SUFFIXES


def deconvert_tensor(name: str, a: np.ndarray) -> np.ndarray:
    a = np.asarray(a)
    if a.ndim == 4:  # HWIO -> OIHW
        return a.transpose(3, 2, 0, 1)
    if (a.ndim == 2 and name.split(".")[-1] == "weight"
            and not name.endswith(_EMBEDDING_SUFFIXES)):
        return np.ascontiguousarray(a.T)  # (in,out) -> (out,in)
    return a


def flatten_tree(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_tree(v, name + "."))
        else:
            out[name] = np.asarray(v)
    return out


def tree_to_state_dict(tree, prefix: str = ""):
    """Nested pytree -> flat torch state_dict (float32 tensors)."""
    import torch

    flat = flatten_tree(tree, prefix)
    return {name: torch.tensor(deconvert_tensor(name, a).astype(np.float32))
            for name, a in flat.items()}


def diffusion_state_dict(schedule: DDPMSchedule):
    """The DDPM buffer dict the reference registers (ddpm.py:19-54)."""
    import torch

    ac = np.asarray(schedule.alphas_cumprod, np.float64)
    buffers = {
        "betas": schedule.betas,
        "alphas_cumprod": schedule.alphas_cumprod,
        "alphas_cumprod_prev": schedule.alphas_cumprod_prev,
        "sqrt_alphas_cumprod": schedule.sqrt_alphas_cumprod,
        "sqrt_one_minus_alphas_cumprod": schedule.sqrt_one_minus_alphas_cumprod,
        "log_one_minus_alphas_cumprod": np.log(1.0 - ac),
        "sqrt_recip_alphas_cumprod": schedule.sqrt_recip_alphas_cumprod,
        "sqrt_recipm1_alphas_cumprod": schedule.sqrt_recipm1_alphas_cumprod,
        "posterior_variance": schedule.posterior_variance,
        "posterior_log_variance_clipped": schedule.posterior_log_variance_clipped,
        "posterior_mean_coef1": schedule.posterior_mean_coef1,
        "posterior_mean_coef2": schedule.posterior_mean_coef2,
    }
    return {k: torch.tensor(np.asarray(v, np.float32)) for k, v in buffers.items()}


def export_gligen_checkpoint(
    path: str,
    unet_params,
    vae_params,
    clip_params,
    schedule: DDPMSchedule,
    config_dict: Dict[str, Any],
    iters: int = 0,
    ema_unet_params=None,
) -> None:
    """Write the reference 4-module dict ckpt. The text encoder keys restore
    the ``transformer.text_model.`` prefix (FrozenCLIPEmbedder wraps the HF
    CLIPTextModel as ``self.transformer``, encoders/modules.py:144-160) plus
    the position_ids buffer the converter drops. ``ema_unet_params`` adds the
    reference trainer's optional ``ema`` entry
    (trainer_combined_layout.py:533-534)."""
    import torch

    text_sd = tree_to_state_dict(clip_params, prefix="transformer.text_model.")
    max_len = clip_params["embeddings"]["position_embedding"]["weight"].shape[0]
    text_sd["transformer.text_model.embeddings.position_ids"] = (
        torch.arange(max_len).unsqueeze(0))

    ckpt = {
        "model": tree_to_state_dict(unet_params),
        "text_encoder": text_sd,
        "autoencoder": tree_to_state_dict(vae_params),
        "diffusion": diffusion_state_dict(schedule),
        "iters": int(iters),
        "config_dict": config_dict,
    }
    if ema_unet_params is not None:
        ckpt["ema"] = tree_to_state_dict(ema_unet_params)
    torch.save(ckpt, path)
