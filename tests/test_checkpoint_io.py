"""Checkpoint formats: GLIGEN dict .pth loading, native io round trip."""
import numpy as np
import torch
import pytest

from layoutllm_t2i_tpu.checkpoint.convert import (
    load_gligen_checkpoint, load_sd_first_conv, read_official_sd_ckpt,
)
from layoutllm_t2i_tpu.checkpoint.io import (
    create_run_dir_with_auto_resume, find_latest_checkpoint, load_checkpoint,
    save_checkpoint,
)


def test_gligen_dict_ckpt_roundtrip(tmp_path):
    ckpt = {
        "model": {
            "input_blocks.0.0.weight": torch.randn(8, 4, 3, 3),
            "input_blocks.0.0.bias": torch.randn(8),
            "position_net.null_positive_feature": torch.zeros(16),
        },
        "autoencoder": {"encoder.conv_in.weight": torch.randn(8, 3, 3, 3),
                        "encoder.conv_in.bias": torch.randn(8)},
        "text_encoder": {
            "transformer.text_model.final_layer_norm.weight": torch.ones(16),
            "transformer.text_model.final_layer_norm.bias": torch.zeros(16),
        },
        "diffusion": {"betas": torch.linspace(1e-4, 2e-2, 10)},
        "iters": 1234,
        "config_dict": {"_content": {"model": {"params": {"model_channels": 8}}}},
    }
    p = tmp_path / "ckpt.pth"
    torch.save(ckpt, str(p))
    params, config, extras = load_gligen_checkpoint(str(p))
    assert params["unet"]["input_blocks"]["0"]["0"]["weight"].shape == (3, 3, 4, 8)
    assert params["vae"]["encoder"]["conv_in"]["weight"].shape == (3, 3, 3, 8)
    assert params["clip_text"]["final_layer_norm"]["weight"].shape == (16,)
    assert config["model"]["params"]["model_channels"] == 8
    assert extras["iters"] == 1234


def test_official_sd_split(tmp_path):
    sd = {"state_dict": {
        "model.diffusion_model.out.2.weight": torch.randn(4, 8, 3, 3),
        "cond_stage_model.transformer.text_model.final_layer_norm.weight": torch.ones(4),
        "first_stage_model.decoder.conv_out.bias": torch.randn(3),
        "model_ema.decay": torch.tensor(0.999),
        "betas": torch.linspace(1e-4, 2e-2, 10),
    }}
    p = tmp_path / "sd.ckpt"
    torch.save(sd, str(p))
    out = read_official_sd_ckpt(str(p))
    assert "out.2.weight" in out["model"]
    assert "decoder.conv_out.bias" in out["autoencoder"]
    assert "betas" in out["diffusion"]
    assert not any("ema" in k for k in out["model"])


def test_sd_first_conv_loader(tmp_path):
    torch.save({"weight": torch.randn(320, 4, 3, 3), "bias": torch.randn(320)},
               str(tmp_path / "conv.pth"))
    conv = load_sd_first_conv(str(tmp_path / "conv.pth"))
    assert conv["weight"].shape == (3, 3, 4, 320)


def test_native_io_and_auto_resume(tmp_path):
    run_dir, ckpt = create_run_dir_with_auto_resume(str(tmp_path), "exp")
    assert ckpt is None and run_dir.endswith("tag00")
    state = {"w": np.arange(4.0), "step": 7}
    save_checkpoint(f"{run_dir}/checkpoint_00000007", state, {"lr": 1e-4})
    found = find_latest_checkpoint(run_dir)
    loaded, cfg = load_checkpoint(found)
    np.testing.assert_array_equal(loaded["w"], state["w"])
    assert cfg["lr"] == 1e-4
    # second launch resumes the same tag
    run_dir2, ckpt2 = create_run_dir_with_auto_resume(str(tmp_path), "exp")
    assert run_dir2 == run_dir and ckpt2 == found
