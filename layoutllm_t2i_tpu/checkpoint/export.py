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


def export_policy_checkpoint(path: str, policy_params) -> None:
    """Write the policy linear as the reference ``ckpt_E.pt`` format —
    ``torch.save(policy_model.linear.state_dict())`` (train_rl.py:218-219),
    i.e. a bare ``{'weight': (out,in), 'bias': (out,)}`` dict the reference
    ``txt2img.py:546-553`` load path (and our ``convert.load_policy``)
    consumes."""
    import torch  # noqa: F401  (tree_to_state_dict imports it too)

    torch.save(tree_to_state_dict(policy_params["linear"]), path)


def export_policy_state(path: str, opt_state, *, epoch: int, lr: float,
                        lr_step_size: int, lr_gamma: float) -> None:
    """Write ``state_E.pt`` in the reference layout (train_rl.py:220-222):
    ``{'optimizer': Adam.state_dict(), 'lr_scheduler': StepLR.state_dict()}``.

    The optax Adam moments map 1:1 onto torch Adam's (both keep the
    *uncorrected* first/second moments and apply bias correction at step
    time from 'step'), so a policy trained here resumes bit-equivalently
    under the reference's ``train_rl.py:100-113`` resume path. Param ids
    follow ``nn.Linear.parameters()`` order: 0=weight (transposed back to
    (out,in)), 1=bias."""
    import torch

    adam = _find_adam_state(opt_state)
    if adam is None:
        raise ValueError("no ScaleByAdamState found in opt_state")
    step = int(np.asarray(adam.count))
    lin_mu, lin_nu = adam.mu["linear"], adam.nu["linear"]

    def _t(name, a):
        return torch.tensor(deconvert_tensor(name, np.asarray(a, np.float32)))

    opt_sd = {
        "state": {
            0: {"step": torch.tensor(float(step)),
                "exp_avg": _t("weight", lin_mu["weight"]),
                "exp_avg_sq": _t("weight", lin_nu["weight"])},
            1: {"step": torch.tensor(float(step)),
                "exp_avg": _t("bias", lin_mu["bias"]),
                "exp_avg_sq": _t("bias", lin_nu["bias"])},
        },
        "param_groups": [{
            "lr": float(lr * lr_gamma ** (epoch // lr_step_size)),
            "betas": (0.9, 0.999), "eps": 1e-8, "weight_decay": 0,
            "amsgrad": False, "maximize": False, "foreach": None,
            "capturable": False, "differentiable": False, "fused": None,
            "params": [0, 1],
        }],
    }
    sched_sd = {
        "step_size": int(lr_step_size), "gamma": float(lr_gamma),
        "base_lrs": [float(lr)], "last_epoch": int(epoch),
        "_step_count": int(epoch) + 1, "verbose": False,
        "_get_lr_called_within_step": False,
        "_last_lr": [float(lr * lr_gamma ** (epoch // lr_step_size))],
    }
    torch.save({"optimizer": opt_sd, "lr_scheduler": sched_sd}, path)


def _find_adam_state(state):
    """Locate the ScaleByAdamState inside a (possibly wrapped) optax state."""
    import optax

    if isinstance(state, optax.ScaleByAdamState):
        return state
    if isinstance(state, (tuple, list)):
        for s in state:
            r = _find_adam_state(s)
            if r is not None:
                return r
    if hasattr(state, "inner_state"):
        return _find_adam_state(state.inner_state)
    return None
