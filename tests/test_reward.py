"""Composite reward smoke with tiny random CLIP towers."""
import numpy as np
import jax
import pytest

from layoutllm_t2i_tpu.models.clip_text import CLIPTextConfig, init_clip_text_params
from layoutllm_t2i_tpu.models.clip_tokenizer import HashTokenizer
from layoutllm_t2i_tpu.models.clip_vision import CLIPVisionConfig, init_clip_vision_params
from layoutllm_t2i_tpu.models.initializers import linear_p
from layoutllm_t2i_tpu.models.policy import init_aesthetic_params
from layoutllm_t2i_tpu.pipeline.reward import COCO80_LABELS, RewardModel


@pytest.fixture(scope="module")
def reward():
    text_cfg = CLIPTextConfig(num_layers=1, hidden_size=32, num_heads=2,
                              intermediate_size=64, vocab_size=512, max_length=16)
    vision_cfg = CLIPVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                                  num_layers=1, num_heads=2, intermediate_size=64,
                                  projection_dim=24)
    k = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    text_params = init_clip_text_params(k1, text_cfg)
    text_params["text_projection"] = linear_p(k4, 32, 24, bias=False)
    return RewardModel(
        text_cfg, text_params, vision_cfg, init_clip_vision_params(k2, vision_cfg),
        init_aesthetic_params(k3, input_size=24),
        HashTokenizer(max_length=16, vocab_size=512),
    )


def test_labels_emb_built(reward):
    assert reward.labels_emb.shape == (80, 24)
    norms = np.linalg.norm(reward.labels_emb, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_nearest_coco_label(reward):
    assert reward.nearest_coco_label("dog") == "dog"
    out = reward.nearest_coco_label("weird novel object")
    assert out in COCO80_LABELS


def test_composite_reward_shapes(reward):
    g = np.random.default_rng(0)
    captions = ["a dog", "a cat on a couch"]
    imgs_pred = g.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    imgs_gt = g.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    layout_pred = [([[0.1, 0.1, 0.4, 0.4]], ["dog"]),
                   ([[0.2, 0.2, 0.6, 0.6], [0.0, 0.5, 1.0, 1.0]], ["cat", "couch"])]
    layout_gt = [([[0.1, 0.1, 0.4, 0.4]], ["dog"]),
                 ([[0.2, 0.2, 0.6, 0.6], [0.0, 0.5, 1.0, 1.0]], ["cat", "couch"])]
    r = reward(captions, imgs_pred, imgs_gt, layout_pred, layout_gt)
    assert r.shape == (2,)
    assert np.isfinite(r).all()
    # identical layouts: mIoU contribution = 10 per example, so reward > 5
    assert (r > 5).all()
