"""DPM-Solver++(2M) (diffusion/samplers.py dpm_sample, arXiv:2211.01095).

Solver-order check uses a SYNTHETIC linear denoiser so the probability-flow
ODE has a well-defined reference solution (a fine-step DDIM run): the
2nd-order solver must land closer to it than 1st-order DDIM at the same
step budget. Pipeline tests cover wiring (segments, CFG, determinism)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from layoutllm_t2i_tpu.diffusion.samplers import (
    ddim_sample, dpm_sample, make_step_tables)
from layoutllm_t2i_tpu.ops.schedules import make_ddpm_schedule
from layoutllm_t2i_tpu.pipeline.inference import InferencePipeline
from layoutllm_t2i_tpu.pipeline.loaders import random_models


SCHEDULE = make_ddpm_schedule("linear", 1000, 0.00085, 0.012)


def _smooth_x0_denoise(x, t, fscale, use_sd):
    """eps-model whose x0-prediction is LINEAR IN log-SNR and independent of
    x — the smooth-x0 regime the DPM++ convergence argument assumes (real
    diffusion models' x0 trajectories are smooth in lambda; an x-coupled
    synthetic like eps=0.9x+c has pathological x0 curvature near t->0 and
    is NOT a valid order probe — measured while building this test)."""
    del fscale, use_sd
    ac = jnp.asarray(SCHEDULE.alphas_cumprod, jnp.float32)
    a = ac[t].reshape(-1, 1, 1, 1)
    alpha, sigma = jnp.sqrt(a), jnp.sqrt(1.0 - a)
    lam = 0.5 * jnp.log(a / (1.0 - a))
    x0 = (jnp.asarray([0.3, -0.2, 0.1, 0.05])
          + jnp.asarray([0.05, 0.1, -0.02, 0.0]) * lam)
    return (x - alpha * x0) / sigma


def _run(sampler_fn, steps, x0):
    tables = make_step_tables(SCHEDULE, steps, eta=0.0, alpha_type=None)
    return np.asarray(sampler_fn(_smooth_x0_denoise, tables, x0,
                                 schedule=SCHEDULE))


def test_dpm_beats_ddim_at_equal_steps():
    x0 = jnp.asarray(
        np.random.RandomState(3).randn(2, 4, 4, 4).astype(np.float32))
    ref = _run(dpm_sample, 900, x0)           # fine-step ODE reference
    # the fine-step solvers agree on the solution (solver-family-unbiased)
    assert np.abs(_run(ddim_sample, 900, x0) - ref).mean() < 5e-3
    for n in (10, 20, 40):
        err_dpm = np.abs(_run(dpm_sample, n, x0) - ref).mean()
        err_ddim = np.abs(_run(ddim_sample, n, x0) - ref).mean()
        assert np.isfinite(err_dpm)
        # measured margins are 3-9x; assert a conservative 2x
        assert err_dpm * 2 < err_ddim, (n, err_dpm, err_ddim)


def test_dpm_deterministic_and_finite():
    x0 = jnp.asarray(
        np.random.RandomState(4).randn(1, 4, 4, 4).astype(np.float32))
    a = _run(dpm_sample, 8, x0)
    b = _run(dpm_sample, 8, x0)
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()


@pytest.fixture(scope="module")
def models():
    return random_models(small=True)


PROMPTS = ["a cat on a table", "a dog"]
LAYOUTS = [([[0.1, 0.1, 0.6, 0.6]], ["cat"]), ([[0.2, 0.2, 0.8, 0.8]], ["dog"])]


def test_pipeline_dpm_end_to_end(models):
    pipe = InferencePipeline(models, steps=6, sampler="dpm",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7))
    imgs = pipe.generate(PROMPTS, LAYOUTS, seed=7)
    assert imgs.shape[0] == 2 and np.isfinite(imgs).all()
    assert 0 <= imgs.min() and imgs.max() <= 1
    np.testing.assert_array_equal(imgs, pipe.generate(PROMPTS, LAYOUTS, seed=7))
    # a different sampler gives a different trajectory
    plms = InferencePipeline(models, steps=6, sampler="plms",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7))
    assert not np.array_equal(imgs, plms.generate(PROMPTS, LAYOUTS, seed=7))


def test_pipeline_dpm_composes_with_cfg_interval(models):
    pipe = InferencePipeline(models, steps=6, sampler="dpm",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7),
                             cfg_interval=(0.0, 0.6))
    imgs = pipe.generate(PROMPTS, LAYOUTS, seed=7)
    assert np.isfinite(imgs).all()


def test_pipeline_dpm_composes_with_encoder_cache(models):
    pipe = InferencePipeline(models, steps=6, sampler="dpm",
                             guidance_scale=7.5, alpha_type=(0.3, 0.0, 0.7),
                             encoder_cache_interval=2)
    imgs = pipe.generate(PROMPTS, LAYOUTS, seed=7)
    assert np.isfinite(imgs).all()
