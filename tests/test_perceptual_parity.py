"""North-star perceptual parity: full-geometry PLMS-50 image vs torch.

The reference's end-to-end claim is that generated images match its torch
pipeline to perceptual tolerance. The fast parity tests cover it piecewise
(SD-geometry forwards + a 4-step trajectory in test_fullscale_parity.py;
50-step trajectories at toy geometry in test_reference_parity.py). This
test closes the remaining gap (VERDICT r3 item 3): ONE 512x512, 50-step,
CFG-7.5, alpha [0.3,0,0.7] sample — reference PLMS sampler + AutoencoderKL
decode (txt2img.py:256-325, plms.py:58-163) vs this framework's sampler +
VAE — same weights, same injected noise, compared as IMAGES with
PSNR + SSIM thresholds.

Cost: ~30-60 min on CPU (50 CFG steps through the f32 torch SD-1.4 UNet
dominate), so it is opt-in twice over: @pytest.mark.slow AND gated on
LLT2I_FULL_PARITY=1. Run:

    LLT2I_FULL_PARITY=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python -m pytest tests/test_perceptual_parity.py -x -q -m slow

The measured result is recorded in PERF.md ("Perceptual parity").
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/GLIGEN"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference repo not available", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

if not os.environ.get("LLT2I_FULL_PARITY"):  # pragma: no cover
    pytest.skip("set LLT2I_FULL_PARITY=1 for the ~1 h full-geometry run",
                allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

from test_fullscale_parity import _our_cfg_sd14, _rand, _ref_unet_sd14, t2j  # noqa: E402
from test_reference_parity import (  # noqa: E402
    _run_our_trajectory,
    _run_reference_trajectory,
)

pytestmark = pytest.mark.slow


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return float("inf") if mse == 0 else 10.0 * np.log10(1.0 / mse)


def _ssim(a, b, win=8):
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
    ssim = ((2 * mu_a * mu_b + C1) * (2 * cov + C2)) / (
        (mu_a ** 2 + mu_b ** 2 + C1) * (var_a + var_b + C2))
    return float(ssim.mean())


def test_plms50_full_geometry_image_parity():
    rng = np.random.default_rng(7)

    # ---- shared weights: SD-1.4 relation-aware UNet + SD VAE, torch init
    ref_unet = _ref_unet_sd14()
    unet_params = t2j(ref_unet)
    cfg = _our_cfg_sd14()

    from ldm.models.autoencoder import AutoencoderKL

    from layoutllm_t2i_tpu.models.vae import VAEConfig, decode

    ddconfig = dict(double_z=True, z_channels=4, resolution=256,
                    in_channels=3, out_ch=3, ch=128, ch_mult=[1, 2, 4, 4],
                    num_res_blocks=2, attn_resolutions=[], dropout=0.0)
    ref_vae = AutoencoderKL(ddconfig, embed_dim=4, scale_factor=0.18215).eval()
    vae_cfg = VAEConfig()  # the defaults ARE the SD geometry
    vae_params = t2j(ref_vae)

    # ---- shared conditioning + injected noise (txt2img.py config: one
    # sample, 64x64x4 latent -> 512x512 image)
    noise = _rand(rng, 1, 64, 64, 4)
    ctx = _rand(rng, 1, 77, 768)
    uc = _rand(rng, 1, 77, 768)
    boxes = np.zeros((1, 30, 4), np.float32)
    boxes[0, 0] = [0.1, 0.3, 0.5, 0.9]
    boxes[0, 1] = [0.55, 0.2, 0.9, 0.5]
    masks = np.zeros((1, 30), np.float32)
    masks[0, :2] = 1
    emb = _rand(rng, 1, 30, 768)
    rel = _rand(rng, 1, 10, 768)
    sd_conv_w = _rand(rng, 320, 4, 3, 3, scale=0.05)
    sd_conv_b = _rand(rng, 320, scale=0.05)

    # ---- reference: PLMS-50 latents -> AutoencoderKL.decode -> [0,1] image
    # (txt2img.py:256-325: clamp(x,-1,1)/2+0.5 after decode)
    lat_ref = _run_reference_trajectory(
        ref_unet, noise, ctx, uc, boxes, masks, emb, rel, sd_conv_w,
        sd_conv_b, steps=50, guidance=7.5, alpha_type=(0.3, 0.0, 0.7))
    with torch.no_grad():
        img_ref = ref_vae.decode(torch.tensor(lat_ref)).numpy()
    img_ref = np.clip(img_ref, -1, 1).transpose(0, 2, 3, 1) * 0.5 + 0.5

    # ---- ours: same trajectory helper + our VAE decode
    from layoutllm_t2i_tpu.checkpoint.convert import convert_tensor

    sd_conv = {
        "weight": jnp.asarray(convert_tensor("weight", torch.tensor(sd_conv_w))),
        "bias": jnp.asarray(sd_conv_b),
    }
    lat_ours = _run_our_trajectory(
        unet_params, cfg, noise, ctx, uc, boxes, masks, emb, rel, sd_conv,
        steps=50, guidance=7.5, alpha_type=(0.3, 0.0, 0.7))
    img_ours = np.asarray(decode(vae_params, vae_cfg, jnp.asarray(lat_ours)))
    img_ours = np.clip(img_ours, -1, 1) * 0.5 + 0.5

    # latent-space agreement first (diagnosable), then the perceptual claim
    lat_err = float(np.max(np.abs(lat_ours.transpose(0, 3, 1, 2) - lat_ref)))
    psnr = _psnr(img_ours[0], img_ref[0])
    ssim = _ssim(img_ours[0], img_ref[0])
    print(f"\n[perceptual parity] latent max|d|={lat_err:.2e} "
          f"PSNR={psnr:.2f} dB SSIM={ssim:.4f}")
    assert psnr >= 35.0, f"PSNR {psnr:.2f} < 35 dB"
    assert ssim >= 0.95, f"SSIM {ssim:.4f} < 0.95"
