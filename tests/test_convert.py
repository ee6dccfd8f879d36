"""Checkpoint conversion parity: random-initialized torch modules -> converted
pytrees -> our apply functions must reproduce the torch outputs. This covers
both the layout translation rules and the model semantics without needing any
pretrained download."""
import numpy as np
import torch
import jax.numpy as jnp

from layoutllm_t2i_tpu.checkpoint.convert import convert_tensor, nest_state_dict
from layoutllm_t2i_tpu.ops import nn as jnn


def test_conv2d_parity(rng):
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(8, 16, 3, padding=1)
    x = rng.standard_normal((2, 8, 10, 12), dtype=np.float32)  # NCHW
    ref = conv(torch.tensor(x)).detach().numpy()
    p = {k: convert_tensor(k, v) for k, v in conv.state_dict().items()}
    ours = np.asarray(jnn.conv2d(p, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=2e-5)


def test_strided_conv_parity(rng):
    torch.manual_seed(1)
    conv = torch.nn.Conv2d(4, 8, 3, stride=2, padding=1)
    x = rng.standard_normal((1, 4, 16, 16), dtype=np.float32)
    ref = conv(torch.tensor(x)).detach().numpy()
    p = {k: convert_tensor(k, v) for k, v in conv.state_dict().items()}
    ours = np.asarray(jnn.conv2d(p, jnp.asarray(x.transpose(0, 2, 3, 1)), stride=2))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=2e-5)


def test_linear_parity(rng):
    torch.manual_seed(2)
    lin = torch.nn.Linear(12, 7)
    x = rng.standard_normal((3, 12), dtype=np.float32)
    ref = lin(torch.tensor(x)).detach().numpy()
    p = {k: convert_tensor(k, v) for k, v in lin.state_dict().items()}
    ours = np.asarray(jnn.linear(p, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_group_norm_parity(rng):
    torch.manual_seed(3)
    gn = torch.nn.GroupNorm(4, 16, eps=1e-6)
    with torch.no_grad():
        gn.weight.uniform_(0.5, 1.5)
        gn.bias.uniform_(-0.5, 0.5)
    x = rng.standard_normal((2, 16, 6, 6), dtype=np.float32)
    ref = gn(torch.tensor(x)).detach().numpy()
    p = {k: convert_tensor(k, v) for k, v in gn.state_dict().items()}
    ours = np.asarray(jnn.group_norm(p, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                     num_groups=4, eps=1e-6))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_clip_text_model_parity(rng):
    """Random HF CLIPTextModel -> converter -> our pure-JAX encoder."""
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel

    from layoutllm_t2i_tpu.models.clip_text import CLIPTextConfig, clip_text_apply

    hf_cfg = HFCfg(vocab_size=200, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   max_position_embeddings=16)
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()

    ids = np.zeros((2, 16), dtype=np.int64)
    ids[0, :5] = [199, 5, 8, 13, 198]   # sot, tokens, eot(=198 high id)
    ids[0, 5:] = 198
    ids[1, :3] = [199, 42, 198]
    ids[1, 3:] = 198
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids))
    ref_hidden = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    params = nest_state_dict(model.state_dict(), strip_prefix="text_model.")
    cfg = CLIPTextConfig(vocab_size=200, hidden_size=32, num_layers=2,
                         num_heads=4, intermediate_size=64, max_length=16)
    hidden, pooled = clip_text_apply(params, cfg, jnp.asarray(ids.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(hidden), ref_hidden, atol=3e-5)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=3e-5)


def test_nested_structure():
    sd = {
        "input_blocks.0.0.weight": torch.zeros(320, 4, 3, 3),
        "input_blocks.0.0.bias": torch.zeros(320),
        "time_embed.0.weight": torch.zeros(1280, 320),
    }
    tree = nest_state_dict(sd)
    assert tree["input_blocks"]["0"]["0"]["weight"].shape == (3, 3, 4, 320)
    assert tree["time_embed"]["0"]["weight"].shape == (320, 1280)
