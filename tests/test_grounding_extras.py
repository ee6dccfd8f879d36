"""Keypoint / map grounding tokenizers, downsampler, ConvNeXt backbone."""
import numpy as np
import jax
import jax.numpy as jnp

from layoutllm_t2i_tpu.models.grounding_extras import (
    grounding_downsampler, init_grounding_downsampler,
    init_position_net_keypoint, init_position_net_map,
    position_net_keypoint, position_net_map,
)


def test_keypoint_tokenizer_shapes():
    P, C = 4, 32
    p = init_position_net_keypoint(jax.random.PRNGKey(0), P, C)
    b = 2
    points = jnp.asarray(np.random.default_rng(0).uniform(size=(b, P * 17, 2)).astype(np.float32))
    masks = jnp.zeros((b, P * 17))
    masks = masks.at[:, :17].set(1.0)
    objs = position_net_keypoint(p, points, masks, P, C)
    assert objs.shape == (b, P * 17, C)
    assert np.isfinite(np.asarray(objs)).all()
    # padded slots use the null embedding -> identical across batch
    o = np.asarray(objs)
    np.testing.assert_allclose(o[0, 17:], o[1, 17:], atol=1e-6)


def test_map_tokenizer_shapes():
    p = init_position_net_map(jax.random.PRNGKey(0), out_dim=16, resize_input=64)
    cond = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 32, 32, 3)).astype(np.float32))
    objs = position_net_map(p, cond, jnp.ones((1,)), resize_input=64)
    assert objs.shape == (1, (64 // 32) ** 2, 16)
    # masked-out sample collapses to null tokens
    objs0 = position_net_map(p, cond, jnp.zeros((1,)), resize_input=64)
    assert not np.allclose(np.asarray(objs), np.asarray(objs0))


def test_downsampler_shapes():
    p = init_grounding_downsampler(jax.random.PRNGKey(0), out_dim=8)
    cond = jnp.ones((2, 128, 128, 3))
    out = grounding_downsampler(p, cond, resize_input=64)
    assert out.shape == (2, 16, 16, 8)
