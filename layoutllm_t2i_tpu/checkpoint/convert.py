"""PyTorch `.pth` checkpoint -> JAX pytree conversion.

Handles both reference formats (SURVEY.md §5):
  (a) official SD single state_dict split by key prefix
      (model.diffusion_model / cond_stage_model / first_stage_model,
       trainer.py:62-83);
  (b) GLIGEN-style dict ckpt {model, text_encoder, autoencoder, diffusion,
       opt, scheduler, iters, config_dict} where the embedded config is the
       source of truth (trainer_combined_layout.py:523-535, interface.py:79).

Layout translation: conv OIHW -> HWIO, nn.Linear (out,in) -> (in,out),
embeddings and 1-D/0-D tensors unchanged. The nested pytree keys are the
torch key path segments, matching the model apply functions exactly.

torch is only imported here (host-side, CPU); the compute path never sees it.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

# names whose 2-D weights are lookup tables, not nn.Linear kernels
_EMBEDDING_SUFFIXES = (
    "token_embedding.weight",
    "position_embedding.weight",
)


def _to_numpy(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().float().numpy())


def convert_tensor(name: str, t) -> np.ndarray:
    a = _to_numpy(t)
    if a.ndim == 4:  # conv OIHW -> HWIO
        return a.transpose(2, 3, 1, 0)
    if (a.ndim == 2 and name.split(".")[-1] == "weight"
            and not name.endswith(_EMBEDDING_SUFFIXES)):
        return a.T  # linear (out,in) -> (in,out)
    return a


def nest_state_dict(sd: Dict[str, Any], strip_prefix: str = "") -> Dict[str, Any]:
    """Flat torch state_dict -> nested pytree keyed by name segments."""
    out: Dict[str, Any] = {}
    for name, tensor in sd.items():
        if strip_prefix:
            if not name.startswith(strip_prefix):
                continue
            name = name[len(strip_prefix):]
        if name.endswith("position_ids"):  # non-param HF buffer
            continue
        parts = name.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        converted = convert_tensor(name, tensor)
        if leaf == "weight" or leaf == "bias":
            node[leaf] = converted
        else:
            node[leaf] = converted
    return out


def read_official_sd_ckpt(path: str) -> Dict[str, Dict[str, Any]]:
    """Official SD ckpt -> {'model','text_encoder','autoencoder','diffusion'}
    flat torch dicts (prefix split as trainer.py:62-83)."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=False)["state_dict"]
    out = {"model": {}, "text_encoder": {}, "autoencoder": {}, "diffusion": {}}
    for k, v in state_dict.items():
        if k.startswith("model.diffusion_model"):
            out["model"][k.replace("model.diffusion_model.", "")] = v
        elif k.startswith("cond_stage_model"):
            out["text_encoder"][k.replace("cond_stage_model.", "")] = v
        elif k.startswith("first_stage_model"):
            out["autoencoder"][k.replace("first_stage_model.", "")] = v
        elif k in ("model_ema.decay", "model_ema.num_updates"):
            pass
        else:
            out["diffusion"][k] = v
    return out


def load_gligen_checkpoint(path: str):
    """GLIGEN dict ckpt -> (params dict of pytrees, config_dict).

    params keys: unet, vae, clip_text — in JAX layout, ready for the apply
    functions. The embedded config_dict drives model-config construction.
    """
    import torch

    saved = torch.load(path, map_location="cpu", weights_only=False)
    config = saved.get("config_dict")
    if isinstance(config, dict) and "_content" in config:
        config = config["_content"]
    params = {
        "unet": nest_state_dict(saved["model"]),
        "vae": nest_state_dict(saved["autoencoder"]),
        "clip_text": nest_state_dict(saved["text_encoder"], strip_prefix="transformer.text_model."),
    }
    extras = {k: saved[k] for k in ("iters",) if k in saved}
    return params, config, extras


def load_official_sd(path: str):
    raw = read_official_sd_ckpt(path)
    return {
        "unet": nest_state_dict(raw["model"]),
        "vae": nest_state_dict(raw["autoencoder"]),
        "clip_text": nest_state_dict(raw["text_encoder"], strip_prefix="transformer.text_model."),
    }


def load_sd_first_conv(path: str) -> Dict[str, np.ndarray]:
    """SD_input_conv_weight_bias.pth -> {'weight','bias'} in JAX layout
    (used by the alpha==0 first-conv restore, openaimodel.py:397-403)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return {k: convert_tensor(k, v) for k, v in sd.items()}


def load_torch_linear(path: str) -> Dict[str, np.ndarray]:
    """A bare nn.Linear state_dict (policy ckpt_E.pt files, train_rl.py:219)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return {k: convert_tensor(k, v) for k, v in sd.items()}


def load_policy(path: str) -> Dict[str, Any]:
    """Reference ``ckpt_E.pt`` (train_rl.py:218-219) -> policy params pytree
    ``{'linear': {'weight': (in,out), 'bias': (out,)}}`` consumed by
    models/policy.policy_scores."""
    return {"linear": load_torch_linear(path)}


def load_policy_state(path: str) -> Dict[str, Any]:
    """Reference ``state_E.pt`` (train_rl.py:220-222) -> Adam moments in JAX
    layout. Returns ``{'step': int, 'mu': tree, 'nu': tree, 'last_epoch':
    int}`` where mu/nu mirror the policy params pytree — enough to rebuild an
    optax Adam state (both frameworks keep uncorrected moments + a step
    counter). Param ids follow nn.Linear.parameters() order: 0=weight,
    1=bias."""
    import torch

    saved = torch.load(path, map_location="cpu", weights_only=False)
    st = saved["optimizer"]["state"]
    mu = {"linear": {"weight": convert_tensor("weight", st[0]["exp_avg"]),
                     "bias": convert_tensor("bias", st[1]["exp_avg"])}}
    nu = {"linear": {"weight": convert_tensor("weight", st[0]["exp_avg_sq"]),
                     "bias": convert_tensor("bias", st[1]["exp_avg_sq"])}}
    return {
        "step": int(float(st[0]["step"])),
        "mu": mu,
        "nu": nu,
        "last_epoch": int(saved.get("lr_scheduler", {}).get("last_epoch", -1)),
    }
