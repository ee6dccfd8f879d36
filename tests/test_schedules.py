"""Golden-value tests of schedule math against the reference formulas.

The torch reference (GLIGEN/ldm/modules/diffusionmodules/util.py, ddpm.py) is
re-derived here with torch ops directly, so any divergence in our numpy/jax
tables is caught without importing reference code.
"""
import math

import numpy as np
import jax.numpy as jnp
import torch

from layoutllm_t2i_tpu.ops import schedules as S


def test_linear_betas_match_torch_formula():
    ours = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    ref = (
        torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000, dtype=torch.float64) ** 2
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_ddpm_schedule_buffers():
    sch = S.make_ddpm_schedule("linear", 1000, 0.00085, 0.012)
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    ac = np.cumprod(1.0 - betas)
    assert sch.num_timesteps == 1000
    np.testing.assert_allclose(sch.alphas_cumprod, ac.astype(np.float32), rtol=1e-7)
    np.testing.assert_allclose(
        sch.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - ac).astype(np.float32), rtol=1e-6
    )
    assert sch.alphas_cumprod_prev[0] == 1.0
    np.testing.assert_allclose(sch.alphas_cumprod_prev[1:], sch.alphas_cumprod[:-1])


def test_ddim_timesteps_uniform_50():
    ts = S.make_ddim_timesteps("uniform", 50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1 and ts[-1] == 981
    assert np.all(np.diff(ts) == 20)


def test_ddim_sampling_parameters_eta0():
    sch = S.make_ddpm_schedule("linear", 1000, 0.00085, 0.012)
    ts = S.make_ddim_timesteps("uniform", 50, 1000)
    sigmas, alphas, alphas_prev = S.make_ddim_sampling_parameters(
        sch.alphas_cumprod.astype(np.float64), ts, eta=0.0
    )
    assert np.all(sigmas == 0)
    np.testing.assert_allclose(alphas, sch.alphas_cumprod[ts])
    assert alphas_prev[0] == sch.alphas_cumprod[0]
    np.testing.assert_allclose(alphas_prev[1:], sch.alphas_cumprod[ts[:-1]])


def test_alpha_generator_stages():
    a = S.alpha_generator(50, [0.3, 0.0, 0.7])
    assert len(a) == 50
    assert a[:15] == [1] * 15
    assert a[15:] == [0] * 35
    a2 = S.alpha_generator(100, [0.8, 0.1, 0.1])
    assert a2[:80] == [1] * 80 and a2[-10:] == [0] * 10
    assert max(a2[80:90]) < 1 and min(a2[80:90]) >= 0


def test_timestep_embedding_vs_torch():
    t = np.array([0, 1, 500, 999], dtype=np.int64)
    dim = 320
    ours = np.asarray(S.timestep_embedding(jnp.asarray(t), dim))
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    )
    args = torch.tensor(t)[:, None].float() * freqs[None]
    ref = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    # f32 sin/cos of large angles (t*freq up to ~1000 rad) differ between
    # platforms by O(t*eps); small-t rows must still be tight.
    np.testing.assert_allclose(ours, ref, atol=5e-3)
    np.testing.assert_allclose(ours[:2], ref[:2], atol=1e-5)


def test_fourier_embed_matches_loop_order():
    x = np.random.default_rng(0).uniform(size=(2, 30, 4)).astype(np.float32)
    ours = np.asarray(S.fourier_embed(jnp.asarray(x), num_freqs=8))
    assert ours.shape == (2, 30, 64)
    # loop reference: for each freq append sin, cos over the full last axis
    freq_bands = 100.0 ** (np.arange(8) / 8)
    parts = []
    for f in freq_bands:
        parts.append(np.sin(f * x))
        parts.append(np.cos(f * x))
    ref = np.concatenate(parts, axis=-1)
    np.testing.assert_allclose(ours, ref, atol=5e-4)
