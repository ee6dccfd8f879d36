"""Sampler math: scanned PLMS/DDIM vs straightforward numpy loops."""
import numpy as np
import jax
import jax.numpy as jnp

from layoutllm_t2i_tpu.ops.schedules import make_ddpm_schedule
from layoutllm_t2i_tpu.diffusion.samplers import (
    make_step_tables, plms_sample, ddim_sample,
)

SCHED = make_ddpm_schedule("linear", 1000, 0.00085, 0.012)


def test_step_tables_loop_order():
    t = make_step_tables(SCHED, 50, alpha_type=(0.3, 0.0, 0.7))
    assert int(t.t[0]) == 981 and int(t.t[-1]) == 1
    assert int(t.t_next[0]) == 961 and int(t.t_next[-1]) == 1
    np.testing.assert_allclose(np.asarray(t.a_t), SCHED.alphas_cumprod[np.asarray(t.t)])
    # a_prev of the final loop step is alphas_cumprod[0] (the ddim table head)
    np.testing.assert_allclose(float(t.a_prev[-1]), SCHED.alphas_cumprod[0])
    assert np.asarray(t.fuser_scale[:15]).tolist() == [1.0] * 15
    assert np.asarray(t.use_sd_conv).tolist() == [False] * 15 + [True] * 35


def _np_update(x, e, a_t, a_prev, sigma, s1m):
    pred_x0 = (x - s1m * e) / np.sqrt(a_t)
    dir_xt = np.sqrt(1.0 - a_prev - sigma ** 2) * e
    return np.sqrt(a_prev) * pred_x0 + dir_xt


def _np_plms(denoise, tables, x):
    """Loop implementation of PLMS (Adams-Bashforth orders 1-4 with Heun
    warm start), following the published algorithm."""
    t = np.asarray(tables.t)
    t_next = np.asarray(tables.t_next)
    a_t = np.asarray(tables.a_t)
    a_prev = np.asarray(tables.a_prev)
    sigma = np.asarray(tables.sigma)
    s1m = np.asarray(tables.sqrt_one_minus_at)
    old = []
    for i in range(len(t)):
        e_t = denoise(x, t[i])
        if len(old) == 0:
            x1 = _np_update(x, e_t, a_t[i], a_prev[i], sigma[i], s1m[i])
            e_nxt = denoise(x1, t_next[i])
            e_prime = (e_t + e_nxt) / 2
        elif len(old) == 1:
            e_prime = (3 * e_t - old[-1]) / 2
        elif len(old) == 2:
            e_prime = (23 * e_t - 16 * old[-1] + 5 * old[-2]) / 12
        else:
            e_prime = (55 * e_t - 59 * old[-1] + 37 * old[-2] - 9 * old[-3]) / 24
        x = _np_update(x, e_prime, a_t[i], a_prev[i], sigma[i], s1m[i])
        old.append(e_t)
        if len(old) >= 4:
            old.pop(0)
    return x


def test_plms_matches_numpy_loop(rng):
    tables = make_step_tables(SCHED, 12)
    x0 = rng.standard_normal((1, 4, 4, 2), dtype=np.float32)
    w = 0.13

    def np_denoise(x, t):
        return w * x * (1 + t / 1000.0)

    def jax_denoise(x, t, fscale, use_sd):
        return w * x * (1 + t[0].astype(jnp.float32) / 1000.0)

    ref = _np_plms(np_denoise, tables, x0.copy())
    ours = np.asarray(plms_sample(jax_denoise, tables, jnp.asarray(x0)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)


def test_ddim_zero_eps_telescopes(rng):
    tables = make_step_tables(SCHED, 10)
    x0 = rng.standard_normal((1, 4, 4, 2), dtype=np.float32)

    def denoise(x, t, fscale, use_sd):
        return jnp.zeros_like(x)

    out = np.asarray(ddim_sample(denoise, tables, jnp.asarray(x0)))
    factor = np.prod(np.sqrt(np.asarray(tables.a_prev) / np.asarray(tables.a_t)))
    np.testing.assert_allclose(out, x0 * factor, rtol=1e-4)


def test_ddim_deterministic_eta0(rng):
    tables = make_step_tables(SCHED, 8)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 2), dtype=np.float32))

    def denoise(x, t, fscale, use_sd):
        return 0.1 * x

    a = np.asarray(ddim_sample(denoise, tables, x0, rng=jax.random.PRNGKey(1)))
    b = np.asarray(ddim_sample(denoise, tables, x0, rng=jax.random.PRNGKey(2)))
    np.testing.assert_array_equal(a, b)


def test_fuser_scale_and_sd_flag_reach_denoiser():
    tables = make_step_tables(SCHED, 10, alpha_type=(0.3, 0.0, 0.7))
    seen = []

    def denoise(x, t, fscale, use_sd):
        seen.append((fscale, use_sd))
        return jnp.zeros_like(x)

    plms_sample(denoise, tables, jnp.zeros((1, 2, 2, 1)))
    # traced values; confirm the signature threads (scan body + Heun branch)
    assert len(seen) >= 2


def test_ddim_eta_adds_noise(rng):
    """eta>0 DDIM is stochastic across rngs but deterministic per rng
    (ddim.py:110-135 with eta sigmas)."""
    import jax

    from layoutllm_t2i_tpu.diffusion.samplers import ddim_sample, make_step_tables
    from layoutllm_t2i_tpu.ops.schedules import make_ddpm_schedule

    schedule = make_ddpm_schedule("linear", 100, 0.00085, 0.012)
    tables = make_step_tables(schedule, 10, eta=1.0)
    assert np.any(np.asarray(tables.sigma) > 0)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))

    def denoise(x, t, fscale, use_sd):
        return 0.1 * x

    a = ddim_sample(denoise, tables, x0, rng=jax.random.PRNGKey(1))
    b = ddim_sample(denoise, tables, x0, rng=jax.random.PRNGKey(2))
    a2 = ddim_sample(denoise, tables, x0, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(a), np.asarray(a2))


def test_alpha_segment_skip_is_bitexact(rng):
    """Steps with statically-zero fuser_scale run a reduced UNet body
    (gated fusers elided); the sampled trajectory must be IDENTICAL to the
    full-body scan — the fusers contribute exactly x + 0*(...) there."""
    from layoutllm_t2i_tpu.models.unet import UNetConfig, init_unet_params
    from layoutllm_t2i_tpu.models.unet import unet_apply

    cfg = UNetConfig(image_size=8, model_channels=32, num_res_blocks=1,
                     attention_resolutions=(2, 1), channel_mult=(1, 2),
                     num_heads=2, context_dim=32, grounding_in_dim=32,
                     grounding_out_dim=32)
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    tables = make_step_tables(SCHED, 10, alpha_type=(0.3, 0.0, 0.7))
    b = 2
    ctx = jnp.asarray(rng.standard_normal((b, 7, 32)), jnp.float32)
    boxes = jnp.tile(jnp.asarray([[0.1, 0.1, 0.8, 0.9]], jnp.float32), (b, 3, 1))
    boxes = jnp.pad(boxes, ((0, 0), (0, 27), (0, 0)))
    masks = jnp.pad(jnp.ones((b, 3), jnp.float32), ((0, 0), (0, 27)))
    pos = jnp.asarray(rng.standard_normal((b, 30, 32)), jnp.float32)
    rel = jnp.asarray(rng.standard_normal((b, 4, 32)), jnp.float32)

    def make_denoise(skip):
        def denoise(x, t, fscale, use_sd):
            return unet_apply(params, cfg, x, t, ctx, boxes, masks, pos, rel,
                              fuser_scale=fscale, skip_gated=skip)
        return denoise

    x0 = jnp.asarray(rng.standard_normal((b, 8, 8, 4)), jnp.float32)
    full = np.asarray(plms_sample(make_denoise(False), tables, x0))
    seg = np.asarray(plms_sample(make_denoise(False), tables, x0,
                                 denoise_skip_fn=make_denoise(True)))
    np.testing.assert_array_equal(full, seg)

    d_full = np.asarray(ddim_sample(make_denoise(False), tables, x0))
    d_seg = np.asarray(ddim_sample(make_denoise(False), tables, x0,
                                   denoise_skip_fn=make_denoise(True)))
    np.testing.assert_array_equal(d_full, d_seg)
