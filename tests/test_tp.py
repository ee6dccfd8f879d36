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


@pytest.mark.parametrize("style", ["heads", "spatial"])
def test_tp_matches_single_device(pipe, style):
    mesh = tp_mesh(8)
    cond, noise = _cond_noise(pipe)
    ref = np.asarray(pipe.sample_latents(cond, noise))
    tp = np.asarray(pipe.sample_latents_tp(mesh, cond, noise, style=style))
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

    with tp_mode(mesh, style="heads"):
        lowered = jax.jit(fresh).lower(
            pipe.models.unet_params, pipe.models.vae_params,
            pipe.models.sd_first_conv, cond, noise, jax.random.PRNGKey(0))
    txt = str(lowered.compiler_ir(dialect="stablehlo"))
    assert txt.count("sharding_constraint") > 50  # constraints survived
    compiled = lowered.compile()
    assert "all-reduce" in compiled.as_text()


def test_tp_spatial_program_has_gathers_and_halos(pipe):
    """'spatial' style: self-attention K/V all-gathered, conv halo exchange
    (collective-permute or all-gather at the 3x3 sites) — the program must
    contain cross-device movement, and the FF/conv dots stay row-local."""
    mesh = tp_mesh(8)
    cond, noise = _cond_noise(pipe)

    def fresh2(up, vp, sc, cond, noise, rng):
        return pipe._sample_fn(up, vp, sc, cond, noise, rng)

    with tp_mode(mesh, style="spatial"):
        lowered = jax.jit(fresh2).lower(
            pipe.models.unet_params, pipe.models.vae_params,
            pipe.models.sd_first_conv, cond, noise, jax.random.PRNGKey(0))
    txt = str(lowered.compiler_ir(dialect="stablehlo"))
    assert txt.count("sharding_constraint") > 50
    comp = lowered.compile().as_text()
    assert "all-gather" in comp or "collective-permute" in comp


def test_tp_spatial_shards_convs_at_two_rows_per_device(pipe):
    """At 4 devices the tiny model's H=8 levels shard 2 rows/device, so the
    conv halo-exchange path (not just attention) is exercised numerically."""
    mesh = tp_mesh(4)
    cond, noise = _cond_noise(pipe)
    ref = np.asarray(pipe.sample_latents(cond, noise))
    tp = np.asarray(pipe.sample_latents_tp(mesh, cond, noise, style="spatial"))
    np.testing.assert_allclose(tp, ref, atol=2e-4)


def test_strided_conv_one_row_per_shard_is_replicated():
    """Regression for the SPMD hazard that motivated min_per_shard=2: a
    stride-2 conv with H == mesh size sharded one row per device computes
    WRONG values (max abs err ~100 on random inputs when forced); the
    shard_rows gate must fall back to a replicated constraint there."""
    from layoutllm_t2i_tpu.ops import nn
    from layoutllm_t2i_tpu.parallel.tp import tp_mode

    rng = np.random.default_rng(0)
    mesh = tp_mesh(8)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    p = {"weight": jnp.asarray(
            rng.standard_normal((3, 3, 16, 16)).astype(np.float32)),
         "bias": jnp.asarray(rng.standard_normal(16).astype(np.float32))}
    ref = jax.jit(lambda x: nn.conv2d(p, x, stride=2))(x)

    def f(x):
        return nn.conv2d(p, x, stride=2)

    with tp_mode(mesh, style="spatial"):
        out = jax.jit(f)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_tp_spatial_keeps_flash_kernel_via_shard_map(monkeypatch):
    """Under 'spatial' TP the Pallas flash kernel stays in play: shard_map
    splits q-token rows over the mesh, K/V replicate, each device runs the
    kernel locally (interpret mode on CPU). Must match the XLA reference."""
    monkeypatch.setenv("LLT2I_TP_FLASH_FORCE", "1")
    from layoutllm_t2i_tpu.ops.attention import attention_with_projections
    from layoutllm_t2i_tpu.parallel.tp import tp_mode

    rng = np.random.default_rng(0)
    B, N, H, C, D = 1, 1024, 2, 40, 64
    x = jnp.asarray(rng.standard_normal((B, N, D)).astype(np.float32))
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    p = {
        "to_q": {"weight": jax.random.normal(ks[0], (D, H * C)) * 0.1},
        "to_k": {"weight": jax.random.normal(ks[1], (D, H * C)) * 0.1},
        "to_v": {"weight": jax.random.normal(ks[2], (D, H * C)) * 0.1},
        "to_out": {"0": {"weight": jax.random.normal(ks[3], (H * C, D)) * 0.1,
                         "bias": jnp.zeros(D)}},
    }
    ref = jax.jit(lambda x: attention_with_projections(p, x, x, x, H,
                                                       impl="xla"))(x)
    mesh = tp_mesh(8)

    def f(x):
        return attention_with_projections(p, x, x, x, H, impl="auto")

    with tp_mode(mesh, style="spatial"):
        out = jax.jit(f)(x)
        # and confirm the program actually contains the shard_map'd kernel
        txt = jax.jit(f).lower(x).compile().as_text()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    assert "all-gather" in txt or "shmap" in txt


def test_tp_composes_with_speed_modes():
    """TP latency mode under int8 weights + dpm + guidance interval +
    encoder cache: GSPMD must partition the cond branches and the resized
    cache carry too (matches the unsharded result)."""
    from layoutllm_t2i_tpu.pipeline.loaders import quantize_unet_int8

    models = quantize_unet_int8(random_models(seed=0, small=True),
                                min_size=128)
    p = InferencePipeline(models, steps=4, sampler="dpm", guidance_scale=7.5,
                          alpha_type=(0.3, 0.0, 0.7),
                          cfg_interval=(0.1, 0.85), encoder_cache_interval=2)
    mesh = tp_mesh(8)
    cond, noise = _cond_noise(p)
    ref = np.asarray(p.sample_latents(cond, noise))
    tp = np.asarray(p.sample_latents_tp(mesh, cond, noise, style="spatial"))
    assert tp.shape == ref.shape and np.isfinite(tp).all()
    np.testing.assert_allclose(tp, ref, atol=2e-4)
