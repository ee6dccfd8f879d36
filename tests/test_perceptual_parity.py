"""North-star perceptual parity: full-geometry PLMS-50 image vs torch.

The reference's end-to-end claim is that generated images match its torch
pipeline to perceptual tolerance. The fast parity tests cover it piecewise
(SD-geometry forwards + a 4-step trajectory in test_fullscale_parity.py;
50-step trajectories at toy geometry in test_reference_parity.py). This
test closes the remaining gap (VERDICT r3 item 3): ONE 512x512, 50-step,
CFG-7.5, alpha [0.3,0,0.7] sample — reference PLMS sampler + AutoencoderKL
decode (txt2img.py:256-325, plms.py:58-163) vs this framework's sampler +
VAE — same weights, same injected noise, compared as IMAGES with
PSNR + SSIM + latent-diff thresholds.

All construction (weights, inputs, RNG order) and the gate values live in
tests/parity_setup.py, shared with scripts/perceptual_parity_run.py so the
test and the resumable runner cannot drift (ADVICE r4).

Cost: ~5.5 h on this 1-core box (50 CFG steps through the f32 torch SD-1.4
UNet dominate), so it is opt-in twice over: @pytest.mark.slow AND gated on
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
    pytest.skip("set LLT2I_FULL_PARITY=1 for the ~5.5 h full-geometry run",
                allow_module_level=True)

import jax.numpy as jnp  # noqa: E402

import parity_setup as ps  # noqa: E402
from test_fullscale_parity import _our_cfg_sd14, t2j  # noqa: E402
from test_reference_parity import (  # noqa: E402
    _run_our_trajectory,
    _run_reference_trajectory,
)

pytestmark = pytest.mark.slow


def test_plms50_full_geometry_image_parity():
    rng = np.random.default_rng(7)

    # ---- shared weights + inputs (tests/parity_setup.py: torch RNG order
    # UNet-then-VAE, fixed _rand call order)
    ref_unet, ref_vae = ps.build_models()
    unet_params = t2j(ref_unet)
    cfg = _our_cfg_sd14()
    vae_params = t2j(ref_vae)
    inp = ps.build_inputs(rng)

    from layoutllm_t2i_tpu.models.vae import VAEConfig, decode

    # ---- reference: PLMS-50 latents -> AutoencoderKL.decode -> [0,1] image
    # (txt2img.py:256-325: clamp(x,-1,1)/2+0.5 after decode)
    lat_ref = _run_reference_trajectory(
        ref_unet, inp["noise"], inp["ctx"], inp["uc"], inp["boxes"],
        inp["masks"], inp["emb"], inp["rel"], inp["sd_conv_w"],
        inp["sd_conv_b"], **ps.SAMPLE)
    with torch.no_grad():
        img_ref = ref_vae.decode(torch.tensor(lat_ref)).numpy()
    img_ref = np.clip(img_ref, -1, 1).transpose(0, 2, 3, 1) * 0.5 + 0.5

    # ---- ours: same trajectory helper + our VAE decode
    sd_conv = ps.sd_conv_pytree(inp["sd_conv_w"], inp["sd_conv_b"])
    lat_ours = _run_our_trajectory(
        unet_params, cfg, inp["noise"], inp["ctx"], inp["uc"], inp["boxes"],
        inp["masks"], inp["emb"], inp["rel"], sd_conv, **ps.SAMPLE)
    img_ours = np.asarray(decode(vae_params, VAEConfig(), jnp.asarray(lat_ours)))
    img_ours = np.clip(img_ours, -1, 1) * 0.5 + 0.5

    # latent-space agreement first (diagnosable), then the perceptual claim
    lat_err = float(np.max(np.abs(lat_ours.transpose(0, 3, 1, 2) - lat_ref)))
    psnr = ps.psnr(img_ours[0], img_ref[0])
    ssim = ps.ssim(img_ours[0], img_ref[0])
    print(f"\n[perceptual parity] latent max|d|={lat_err:.2e} "
          f"PSNR={psnr:.2f} dB SSIM={ssim:.4f}")
    assert lat_err < ps.LATENT_GATE, f"latent max|d| {lat_err:.2e} >= 5e-3"
    assert psnr >= ps.PSNR_GATE_DB, f"PSNR {psnr:.2f} < 35 dB"
    assert ssim >= ps.SSIM_GATE, f"SSIM {ssim:.4f} < 0.98"
