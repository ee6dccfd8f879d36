"""Tensor-parallel latency mode: numerics + partitioning on the 8-device
virtual CPU mesh (SURVEY.md §4(d) validation strategy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from layoutllm_t2i_tpu.parallel.tp import tp_mesh, tp_mode
from layoutllm_t2i_tpu.pipeline.inference import InferencePipeline
from layoutllm_t2i_tpu.pipeline.loaders import random_models


@pytest.fixture(scope="module")
def pipe():
    models = random_models(seed=0, small=True)
    return InferencePipeline(models, steps=2, guidance_scale=7.5)


def _cond_noise(pipe):
    cond = pipe.build_cond(["a dog next to a cat"],
                           [([[0.1, 0.1, 0.5, 0.5], [0.5, 0.5, 0.9, 0.9]],
                             ["dog", "cat"])],
                           [["dog next to cat"]])
    m = pipe.models
    noise = jax.random.normal(
        jax.random.PRNGKey(3),
        (1, m.unet_cfg.image_size, m.unet_cfg.image_size,
         m.unet_cfg.in_channels), jnp.float32)
    return cond, noise


def test_tp_matches_single_device(pipe):
    mesh = tp_mesh(8)
    cond, noise = _cond_noise(pipe)
    ref = np.asarray(pipe.sample_latents(cond, noise))
    tp = np.asarray(pipe.sample_latents_tp(mesh, cond, noise))
    assert tp.shape == ref.shape
    # same math, different partitioning: f32 reduction-order differences only
    np.testing.assert_allclose(tp, ref, atol=2e-4)


def test_tp_program_is_actually_partitioned(pipe):
    """The TP program must shard the FF inner dim / attention heads — i.e.
    contain cross-device collectives — otherwise the mode is silently a
    replicated no-op."""
    mesh = tp_mesh(8)
    cond, noise = _cond_noise(pipe)
    def fresh(up, vp, sc, cond, noise, rng):
        # fresh identity: a cached non-tp trace of _sample_fn must not be
        # reused (see sample_latents_tp)
        return pipe._sample_fn(up, vp, sc, cond, noise, rng)

    with tp_mode(mesh):
        lowered = jax.jit(fresh).lower(
            pipe.models.unet_params, pipe.models.vae_params,
            pipe.models.sd_first_conv, cond, noise, jax.random.PRNGKey(0))
    txt = str(lowered.compiler_ir(dialect="stablehlo"))
    assert txt.count("sharding_constraint") > 50  # constraints survived
    compiled = lowered.compile()
    assert "all-reduce" in compiled.as_text()
