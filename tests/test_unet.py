"""UNet structure and forward-shape tests on a tiny config."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from layoutllm_t2i_tpu.models.unet import (
    UNetConfig, init_unet_params, unet_apply, input_block_specs, output_block_specs,
)


def tiny_cfg(**kw):
    base = dict(
        image_size=8, in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(2, 1), channel_mult=(1, 2),
        num_heads=2, context_dim=16, grounding_in_dim=16, grounding_out_dim=16,
    )
    base.update(kw)
    return UNetConfig(**base)


def test_sd_layout_matches_reference_structure():
    # SD-1.x: input_blocks = [C | RT RT D | RT RT D | RT RT D | R R]
    cfg = UNetConfig()
    kinds = [s[0] for s in input_block_specs(cfg)]
    assert kinds == [
        "conv", "res_st", "res_st", "down", "res_st", "res_st", "down",
        "res_st", "res_st", "down", "res", "res",
    ]
    out = output_block_specs(cfg)
    okinds = [(s[0], s[4]) for s in out]
    # output_blocks = [R R RU | RT RT RTU | RT RT RTU | RT RT RT]
    assert okinds == [
        ("res", False), ("res", False), ("res", True),
        ("res_st", False), ("res_st", False), ("res_st", True),
        ("res_st", False), ("res_st", False), ("res_st", True),
        ("res_st", False), ("res_st", False), ("res_st", False),
    ]
    # channel bookkeeping: first out block consumes 1280+1280
    assert out[0][1] == 2560
    assert out[-1][3] == 320


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_cfg()
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _dummy_inputs(cfg, b=2, mo=5, r=3, seed=0):
    g = np.random.default_rng(seed)
    x = g.standard_normal((b, cfg.image_size, cfg.image_size, cfg.in_channels), dtype=np.float32)
    t = np.array([10, 500][:b], dtype=np.int32)
    context = g.standard_normal((b, 7, cfg.context_dim), dtype=np.float32)
    boxes = np.zeros((b, mo, 4), dtype=np.float32)
    boxes[:, 0] = [0.1, 0.1, 0.6, 0.7]
    masks = np.zeros((b, mo), dtype=np.float32)
    masks[:, 0] = 1
    pos = g.standard_normal((b, mo, cfg.grounding_in_dim), dtype=np.float32)
    relations = g.standard_normal((b, r, cfg.context_dim), dtype=np.float32)
    return map(jnp.asarray, (x, t, context, boxes, masks, pos, relations))


def test_forward_shape_and_determinism(tiny_model):
    cfg, params = tiny_model
    x, t, context, boxes, masks, pos, relations = _dummy_inputs(cfg)
    fn = jax.jit(lambda *a: unet_apply(params, cfg, *a))
    out1 = fn(x, t, context, boxes, masks, pos, relations)
    out2 = fn(x, t, context, boxes, masks, pos, relations)
    assert out1.shape == (2, cfg.image_size, cfg.image_size, cfg.out_channels)
    assert np.array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_fuser_scale_changes_output(tiny_model):
    cfg, params = tiny_model
    # zero-gate init means fuser contributes nothing; bump a gate so the scale
    # input is observable, as the alpha schedule relies on it
    params = jax.tree.map(lambda x: x, params)
    params["input_blocks"]["1"]["1"]["transformer_blocks"]["0"]["fuser"]["alpha_attn"] = jnp.asarray(1.0)
    x, t, context, boxes, masks, pos, relations = _dummy_inputs(cfg)
    o1 = unet_apply(params, cfg, x, t, context, boxes, masks, pos, relations, fuser_scale=1.0)
    o0 = unet_apply(params, cfg, x, t, context, boxes, masks, pos, relations, fuser_scale=0.0)
    assert not np.allclose(np.asarray(o1), np.asarray(o0))


def test_grounding_null_input_matches_zero_masks(tiny_model):
    # CFG uncond half uses all-zero grounding (text_layout_tokinzer_input.py:47-62)
    cfg, params = tiny_model
    x, t, context, boxes, masks, pos, relations = _dummy_inputs(cfg)
    zb, zm, zp = jnp.zeros_like(boxes), jnp.zeros_like(masks), jnp.zeros_like(pos)
    out = unet_apply(params, cfg, x, t, context, zb, zm, zp, relations)
    assert np.isfinite(np.asarray(out)).all()


def test_conv1x1_dot_matches_conv_lowering(rng):
    """1x1 stride-1 pad-0 convs lower to a channel dot (layout fix, PERF.md
    round 3); both lowerings must agree numerically."""
    import os
    from layoutllm_t2i_tpu.models import initializers as init
    from layoutllm_t2i_tpu.ops import nn as jnn

    p = init.conv_p(jax.random.PRNGKey(0), 1, 1, 12, 20)
    x = jnp.asarray(rng.standard_normal((2, 9, 9, 12)), jnp.float32)
    os.environ["LLT2I_CONV1X1_DOT"] = "1"
    y_dot = jnn.conv2d(p, x, padding=0)
    os.environ["LLT2I_CONV1X1_DOT"] = "0"
    try:
        y_conv = jnn.conv2d(p, x, padding=0)
    finally:
        os.environ.pop("LLT2I_CONV1X1_DOT", None)
    np.testing.assert_allclose(np.asarray(y_dot), np.asarray(y_conv),
                               atol=1e-5, rtol=1e-5)
