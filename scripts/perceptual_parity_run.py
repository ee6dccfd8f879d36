"""Resumable runner for the full-geometry perceptual-parity measurement.

tests/test_perceptual_parity.py is the north-star check (one 512x512
PLMS-50 CFG-7.5 image: reference torch pipeline vs this framework, same
weights + injected noise, compared with PSNR/SSIM). On this box (nproc=1)
the torch side alone runs ~6-7 min/step => ~5.5 h, which does not fit one
round's wall clock — so this script runs the SAME computation (same seeds,
same construction order, imports the test helpers) in phases that each
checkpoint their artifact to disk and are skipped on re-run:

    ours_lat.npy -> ours_img.npy -> ref_lat.npy -> ref_img.npy -> result.json

Kill it / lose the round boundary / re-launch: it resumes at the first
missing artifact. Our (cheap) side runs first so a partial run still
yields the framework half. Launch:

    nohup python scripts/perceptual_parity_run.py \
        > /tmp/parity_run.log 2>&1 &

Artifacts land in $LLT2I_PARITY_CKPT (default /tmp/parity_ckpt); the final
result.json is the row to record in PERF.md ("Perceptual parity").
Determinism contract with the test: torch.manual_seed(0) before building
UNet-then-VAE (the modules consume the global torch RNG stream in that
order), numpy default_rng(7) with the exact _rand call order of
test_perceptual_parity.test_plms50_full_geometry_image_parity.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TESTS = os.path.join(REPO, "tests")
CKPT = os.environ.get("LLT2I_PARITY_CKPT", "/tmp/parity_ckpt")

# CPU jax with full-precision matmuls — the faithful comparison against the
# torch f32 oracle (mirrors tests/conftest.py, which does not run here)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
for p in (REPO, TESTS):
    if p not in sys.path:
        sys.path.insert(0, p)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import torch  # noqa: E402


def _stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _have(name):
    return os.path.exists(os.path.join(CKPT, name))


def _save(name, arr):
    path = os.path.join(CKPT, name)
    np.save(path + ".tmp.npy", arr)
    os.replace(path + ".tmp.npy", path)
    _stamp(f"saved {name} {arr.shape}")


def _load(name):
    return np.load(os.path.join(CKPT, name))


def main():
    os.makedirs(CKPT, exist_ok=True)
    if _have("result.json"):
        _stamp("result.json already present:")
        print(open(os.path.join(CKPT, "result.json")).read())
        return

    # ---- shared weights + inputs: tests/parity_setup.py is the single
    # source of truth for construction (ADVICE r4 — no duplication here)
    os.environ["LLT2I_FULL_PARITY"] = "1"  # test module skip-gates on this
    torch.manual_seed(0)  # test module does this at import time
    import parity_setup as ps
    from test_fullscale_parity import _our_cfg_sd14, t2j
    from test_reference_parity import (
        _run_our_trajectory,
        _run_reference_trajectory,
    )

    rng = np.random.default_rng(7)
    _stamp("building torch UNet (SD-1.4 geometry) + VAE")
    ref_unet, ref_vae = ps.build_models()
    inp = ps.build_inputs(rng)

    from layoutllm_t2i_tpu.models.vae import VAEConfig, decode

    # ---- phase 1+2: OUR trajectory + VAE decode (cheap side first)
    if not _have("ours_lat.npy"):
        _stamp("phase ours_lat: jax PLMS-50 trajectory (CPU, highest prec)")
        unet_params = t2j(ref_unet)
        cfg = _our_cfg_sd14()
        sd_conv = ps.sd_conv_pytree(inp["sd_conv_w"], inp["sd_conv_b"])
        lat_ours = _run_our_trajectory(
            unet_params, cfg, inp["noise"], inp["ctx"], inp["uc"],
            inp["boxes"], inp["masks"], inp["emb"], inp["rel"], sd_conv,
            **ps.SAMPLE)
        _save("ours_lat.npy", np.asarray(lat_ours))
    if not _have("ours_img.npy"):
        _stamp("phase ours_img: our VAE decode")
        vae_params = t2j(ref_vae)
        img = np.asarray(decode(vae_params, VAEConfig(),
                                jnp.asarray(_load("ours_lat.npy"))))
        _save("ours_img.npy", np.clip(img, -1, 1) * 0.5 + 0.5)

    # ---- phase 3+4: reference trajectory + decode (the ~5.5 h side)
    if not _have("ref_lat.npy"):
        _stamp("phase ref_lat: torch PLMS-50 trajectory (~6-7 min/step here)")
        lat_ref = _run_reference_trajectory(
            ref_unet, inp["noise"], inp["ctx"], inp["uc"], inp["boxes"],
            inp["masks"], inp["emb"], inp["rel"], inp["sd_conv_w"],
            inp["sd_conv_b"], **ps.SAMPLE)
        _save("ref_lat.npy", np.asarray(lat_ref))
    if not _have("ref_img.npy"):
        _stamp("phase ref_img: torch AutoencoderKL decode")
        with torch.no_grad():
            img_ref = ref_vae.decode(torch.tensor(_load("ref_lat.npy"))).numpy()
        _save("ref_img.npy",
              np.clip(img_ref, -1, 1).transpose(0, 2, 3, 1) * 0.5 + 0.5)

    # ---- compare (gates from parity_setup — same ones the test asserts)
    img_ours, img_ref = _load("ours_img.npy"), _load("ref_img.npy")
    lat_err = float(np.max(np.abs(
        _load("ours_lat.npy").transpose(0, 3, 1, 2) - _load("ref_lat.npy"))))
    psnr = ps.psnr(img_ours[0], img_ref[0])
    ssim = ps.ssim(img_ours[0], img_ref[0])
    res = {
        "latent_max_abs": lat_err,
        "psnr_db": round(psnr, 2),
        "ssim": round(ssim, 4),
        "pass": bool(psnr >= ps.PSNR_GATE_DB and ssim >= ps.SSIM_GATE
                     and lat_err < ps.LATENT_GATE),
        "config": "512x512 PLMS-50 CFG-7.5 alpha[0.3,0,0.7], f32-highest",
    }
    with open(os.path.join(CKPT, "result.json"), "w") as f:
        json.dump(res, f)
    _stamp("RESULT " + json.dumps(res))


if __name__ == "__main__":
    main()
