"""Guidance interval (arXiv:2404.07724): CFG applied only on a static step
interval; off-steps run the cond-only denoiser at half the batch. Exact
FLOP reduction (the off-step math IS guidance_scale=1), published quality
gains when guidance is confined to middle noise levels. No reference
counterpart (GLIGEN applies CFG on every step, plms.py:115-124)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from layoutllm_t2i_tpu.pipeline.inference import InferencePipeline
from layoutllm_t2i_tpu.pipeline.loaders import random_models


@pytest.fixture(scope="module")
def models():
    return random_models(small=True)


PROMPTS = ["a cat on a table", "a dog"]
LAYOUTS = [([[0.1, 0.1, 0.6, 0.6]], ["cat"]), ([[0.2, 0.2, 0.8, 0.8]], ["dog"])]


def test_cfg_on_steps_table(models):
    pipe = InferencePipeline(models, steps=10, sampler="plms",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7),
                             cfg_interval=(0.2, 0.7))
    on = pipe._cfg_on_steps()
    frac = np.arange(10) / 9.0
    np.testing.assert_array_equal(on, (frac >= 0.2) & (frac <= 0.7))
    assert 0 < on.sum() < 10


def test_full_interval_matches_baseline(models):
    """cfg_interval covering every step must reproduce the default pipeline
    bit-for-bit (same denoise variant selected everywhere)."""
    base = InferencePipeline(models, steps=5, sampler="plms",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7))
    full = InferencePipeline(models, steps=5, sampler="plms",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7),
                             cfg_interval=(0.0, 1.0))
    a = base.generate(PROMPTS, LAYOUTS, seed=5)
    b = full.generate(PROMPTS, LAYOUTS, seed=5)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("sampler", ["plms", "ddim"])
def test_partial_interval_runs_and_differs(models, sampler):
    base = InferencePipeline(models, steps=6, sampler=sampler,
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7))
    part = InferencePipeline(models, steps=6, sampler=sampler,
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7),
                             cfg_interval=(0.0, 0.6))
    a = base.generate(PROMPTS, LAYOUTS, seed=5)
    b = part.generate(PROMPTS, LAYOUTS, seed=5)
    assert b.shape == a.shape and np.isfinite(b).all()
    assert 0 <= b.min() and b.max() <= 1
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(b, part.generate(PROMPTS, LAYOUTS, seed=5))


def test_off_step_math_is_guidance_one(models):
    """With the interval empty (CFG never on), the result equals a
    guidance_scale=1.0 pipeline — the off-step path IS the cond-only eps."""
    g1 = InferencePipeline(models, steps=4, sampler="plms",
                           guidance_scale=1.0, alpha_type=(0.3, 0.0, 0.7))
    off = InferencePipeline(models, steps=4, sampler="plms",
                            guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7),
                            cfg_interval=(2.0, 3.0))
    a = g1.generate(PROMPTS, LAYOUTS, seed=9)
    b = off.generate(PROMPTS, LAYOUTS, seed=9)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("interval", [(0.0, 0.7), (0.3, 1.0)])
def test_composes_with_encoder_cache(models, interval):
    """enc cache + guidance interval: the carried cache is batch-resized at
    segment boundaries and boundary steps are forced key (_resize_cache).
    (0.3, 1.0) additionally exercises a cond-only FIRST segment, where
    cache_init must be built at the single-batch layout."""
    pipe = InferencePipeline(models, steps=8, sampler="plms",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7),
                             encoder_cache_interval=2, cfg_interval=interval)
    keys = pipe._key_steps()
    cfg_on = pipe._cfg_on_steps()
    for i in range(1, len(keys)):
        if cfg_on[i] != cfg_on[i - 1]:
            assert keys[i], f"cfg boundary {i} must be a key step"
    imgs = pipe.generate(PROMPTS, LAYOUTS, seed=4)
    assert np.isfinite(imgs).all() and imgs.min() >= 0 and imgs.max() <= 1
    np.testing.assert_array_equal(imgs, pipe.generate(PROMPTS, LAYOUTS, seed=4))


def test_segments_split_on_both_predicates():
    from layoutllm_t2i_tpu.diffusion.samplers import (
        StepTables, _alpha_segments)

    s = 10
    fuser = np.array([1, 1, 1, 0, 0, 0, 0, 0, 0, 0], np.float32)
    t = StepTables(*(jnp.zeros(s) for _ in range(6)),
                   fuser_scale=jnp.asarray(fuser),
                   use_sd_conv=jnp.asarray(fuser == 0))
    cfg_on = np.array([1, 1, 1, 1, 1, 0, 0, 0, 0, 0], bool)
    segs = _alpha_segments(t, denoise_skip_fn=lambda: None, cfg_on=cfg_on)
    assert segs == [(0, 3, False, True), (3, 5, True, True),
                    (5, 10, True, False)]
    # without cfg_on: the original two segments
    segs2 = _alpha_segments(t, denoise_skip_fn=lambda: None)
    assert segs2 == [(0, 3, False, True), (3, 10, True, True)]


def test_parse_cfg_interval_validation():
    from layoutllm_t2i_tpu.pipeline.inference import parse_cfg_interval

    assert parse_cfg_interval(None) is None
    assert parse_cfg_interval("") is None
    assert parse_cfg_interval("0.1,0.85") == (0.1, 0.85)
    assert parse_cfg_interval((0.0, 0.5)) == (0.0, 0.5)
    for bad in ("0.75,0.0", "0.75", "a,b", "0.1,0.2,0.3", "-0.1,0.5"):
        with pytest.raises(ValueError):
            parse_cfg_interval(bad)
