"""Mixed-precision dtype policy: bf16 activations must stay bf16 through
every block even when the params are f32 (master weights in the trainer's
preview path, or a converted f32 .pth checkpoint on TPU).

Round-3 regression: `scale * tanh(alpha_attn)` with an f32 alpha param
promoted every activation downstream of the first gated fuser to f32 —
invisible in the bf16-param bench, hit by the SD-scale trainer preview
(whose f32 FFN blocks then overflowed the 16 MB scoped-vmem limit).
Reference sites: GLIGEN/ldm/modules/attention.py:206-234 (gated fusers),
:284-359 (RelationCrossAttention).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from layoutllm_t2i_tpu.models import blocks
from layoutllm_t2i_tpu.models.unet import UNetConfig, init_unet_params, unet_apply


def _f32_params(init_fn, *args):
    return jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), init_fn(*args))


def test_gated_fusers_keep_bf16_with_f32_params():
    k = jax.random.PRNGKey(0)
    d, heads, dh = 64, 2, 32
    p = _f32_params(blocks.init_gated_self_attention, k, d, d, heads, dh)
    x = jnp.zeros((1, 16, d), jnp.bfloat16)
    objs = jnp.zeros((1, 4, d), jnp.bfloat16)
    # traced f32 scalar scale, exactly like the scanned fuser_scale
    out = jax.eval_shape(
        lambda s: blocks.gated_self_attention(p, x, objs, heads, s),
        jax.ShapeDtypeStruct((), jnp.float32))
    assert out.dtype == jnp.bfloat16

    p2 = _f32_params(blocks.init_gated_cross_attention, k, d, d, d, heads, dh)
    out2 = jax.eval_shape(
        lambda s: blocks.gated_cross_attention(p2, x, objs, heads, s),
        jax.ShapeDtypeStruct((), jnp.float32))
    assert out2.dtype == jnp.bfloat16


def test_relation_fuser_keeps_bf16_with_f32_params():
    k = jax.random.PRNGKey(1)
    d, heads, dh = 64, 2, 32
    p = _f32_params(blocks.init_relation_cross_attention, k, d, d, d, heads, dh)
    x = jnp.zeros((1, 16, d), jnp.bfloat16)
    rel = jnp.zeros((1, 3, d), jnp.bfloat16)
    boxes = jnp.asarray([[[0.0, 0.0, 0.6, 0.6], [0.2, 0.2, 0.9, 0.9]]])
    masks = jnp.asarray([[1.0, 1.0]])
    out = jax.eval_shape(
        lambda xx: blocks.relation_cross_attention(p, xx, rel, boxes, masks,
                                                   4, 4, heads), x)
    assert out.dtype == jnp.bfloat16


def test_unet_ffn_sites_see_bf16_with_f32_params(monkeypatch):
    """Trace the whole UNet with f32 params + bf16 input and assert the
    activation reaching every FF site (the widest downstream consumer)
    stays bf16."""
    from layoutllm_t2i_tpu.ops import nn as nnops

    cfg = UNetConfig(image_size=8, model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2, 1), channel_mult=(1, 2),
                     num_heads=2, context_dim=32, grounding_in_dim=32,
                     grounding_out_dim=32)
    params = _f32_params(init_unet_params, jax.random.PRNGKey(2), cfg)

    seen = []
    orig = nnops.ln_geglu_ff_res

    def spy(p_ff, p_norm, x):
        seen.append(x.dtype)
        return orig(p_ff, p_norm, x)

    monkeypatch.setattr(blocks.nn, "ln_geglu_ff_res", spy)

    b, mo, r = 1, 3, 2
    x = jnp.zeros((b, 8, 8, cfg.in_channels), jnp.bfloat16)
    jax.eval_shape(
        lambda fs: unet_apply(
            params, cfg, x, jnp.zeros((b,), jnp.int32),
            jnp.zeros((b, 7, cfg.context_dim), jnp.bfloat16),
            jnp.zeros((b, mo, 4)), jnp.zeros((b, mo)),
            jnp.zeros((b, mo, cfg.grounding_in_dim), jnp.bfloat16),
            jnp.zeros((b, r, cfg.context_dim), jnp.bfloat16),
            fuser_scale=fs),
        jax.ShapeDtypeStruct((), jnp.float32))
    assert seen, "spy never fired — FF sites not reached"
    assert all(d == jnp.bfloat16 for d in seen), seen
