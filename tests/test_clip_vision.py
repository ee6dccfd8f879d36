"""CLIP vision tower parity vs a random HF CLIPVisionModel through the
converter (covers the reward/CLIPScore feature path)."""
import numpy as np
import torch
import jax.numpy as jnp

from layoutllm_t2i_tpu.checkpoint.convert import nest_state_dict
from layoutllm_t2i_tpu.models.clip_vision import (
    CLIPVisionConfig, clip_image_features, clip_vision_apply,
)


def test_clip_vision_parity():
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel

    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=4, image_size=28, patch_size=14)
    torch.manual_seed(0)
    model = CLIPVisionModel(hf_cfg).eval()

    x = np.random.default_rng(0).standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out = model(pixel_values=torch.tensor(x))
    ref_hidden = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    params = {"vision_model": nest_state_dict(model.state_dict(),
                                              strip_prefix="vision_model.")}
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                           num_layers=2, num_heads=4, intermediate_size=64,
                           projection_dim=8)
    hidden, pooled = clip_vision_apply(params, cfg,
                                       jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=3e-5)

    # projection: get_image_features parity
    proj = torch.nn.Linear(32, 8, bias=False)
    with torch.no_grad():
        ref_feat = proj(torch.tensor(ref_pooled)).numpy()
    params["visual_projection"] = nest_state_dict(
        {"weight": proj.weight.detach()})
    feat = clip_image_features(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(feat), ref_feat, atol=3e-5)
