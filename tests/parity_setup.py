"""Shared construction for the full-geometry perceptual-parity check.

tests/test_perceptual_parity.py (the north-star gate) and
scripts/perceptual_parity_run.py (the resumable on-box runner) must run
the IDENTICAL computation — same torch-RNG consumption order (UNet then
VAE), same numpy `_rand` call order, same shapes/scales — or recorded
parity artifacts silently desynchronize from what the test asserts
(ADVICE r4). This module is the single source of truth both import.

Gates (enforced here so the doc in PERF.md cannot drift from the code):
PSNR >= 35 dB, SSIM >= 0.98, latent max|d| < 5e-3. The measured result
at production config is far inside all three (128.2 dB / 1.000 / 1.1e-4,
perf_data/parity_result.json).
"""
from __future__ import annotations

import numpy as np

PSNR_GATE_DB = 35.0
SSIM_GATE = 0.98
LATENT_GATE = 5e-3

# SD-1.4 VAE geometry (GLIGEN/configs/coco2014.yaml autoencoder params)
VAE_DDCONFIG = dict(double_z=True, z_channels=4, resolution=256,
                    in_channels=3, out_ch=3, ch=128, ch_mult=[1, 2, 4, 4],
                    num_res_blocks=2, attn_resolutions=[], dropout=0.0)

SAMPLE = dict(steps=50, guidance=7.5, alpha_type=(0.3, 0.0, 0.7))


def build_models():
    """Torch UNet (SD-1.4 relation-aware geometry) then VAE — this order
    is the torch-global-RNG contract; callers must torch.manual_seed(0)
    first (test_fullscale_parity does it at import)."""
    from ldm.models.autoencoder import AutoencoderKL

    from test_fullscale_parity import _ref_unet_sd14

    ref_unet = _ref_unet_sd14()
    ref_vae = AutoencoderKL(VAE_DDCONFIG, embed_dim=4,
                            scale_factor=0.18215).eval()
    return ref_unet, ref_vae


def build_inputs(rng):
    """Conditioning + injected noise, in the exact `_rand` consumption
    order (noise, ctx, uc, emb, rel, sd_conv_w, sd_conv_b) the recorded
    parity artifacts were produced with. rng = np.random.default_rng(7)."""
    from test_fullscale_parity import _rand

    inp = {}
    inp["noise"] = _rand(rng, 1, 64, 64, 4)
    inp["ctx"] = _rand(rng, 1, 77, 768)
    inp["uc"] = _rand(rng, 1, 77, 768)
    boxes = np.zeros((1, 30, 4), np.float32)
    boxes[0, 0] = [0.1, 0.3, 0.5, 0.9]
    boxes[0, 1] = [0.55, 0.2, 0.9, 0.5]
    inp["boxes"] = boxes
    masks = np.zeros((1, 30), np.float32)
    masks[0, :2] = 1
    inp["masks"] = masks
    inp["emb"] = _rand(rng, 1, 30, 768)
    inp["rel"] = _rand(rng, 1, 10, 768)
    inp["sd_conv_w"] = _rand(rng, 320, 4, 3, 3, scale=0.05)
    inp["sd_conv_b"] = _rand(rng, 320, scale=0.05)
    return inp


def sd_conv_pytree(sd_conv_w, sd_conv_b):
    """First-conv restore weights as our pytree (checkpoint.convert layout)."""
    import jax.numpy as jnp
    import torch

    from layoutllm_t2i_tpu.checkpoint.convert import convert_tensor

    return {
        "weight": jnp.asarray(convert_tensor("weight", torch.tensor(sd_conv_w))),
        "bias": jnp.asarray(sd_conv_b),
    }


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(1.0 / mse)


def ssim(a, b, win=8):
    """Mean local SSIM over non-overlapping win x win patches, per channel
    (standard constants, dynamic range 1.0). No scipy/skimage in the image,
    so patch means/vars are computed with reshape-reductions."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    h, w = a.shape[0] - a.shape[0] % win, a.shape[1] - a.shape[1] % win
    a = a[:h, :w].reshape(h // win, win, w // win, win, -1)
    b = b[:h, :w].reshape(h // win, win, w // win, win, -1)
    mu_a, mu_b = a.mean(axis=(1, 3)), b.mean(axis=(1, 3))
    var_a, var_b = a.var(axis=(1, 3)), b.var(axis=(1, 3))
    cov = (a * b).mean(axis=(1, 3)) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + C1) * (2 * cov + C2)) / (
        (mu_a ** 2 + mu_b ** 2 + C1) * (var_a + var_b + C2))
    return float(s.mean())
