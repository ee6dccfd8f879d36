"""PLMS / DDIM samplers compiled into a single lax.scan.

Reference behavior: GLIGEN/ldm/models/diffusion/{plms.py, ddim.py}. The
reference runs a host-side Python loop that per step (a) mutates every gated
module's ``scale``, (b) reloads SD first-conv weights from disk when the
grounding alpha hits 0, and (c) launches two sequential UNet forwards for
classifier-free guidance. Here:

  * per-step grounding alpha and the SD-conv flag are scanned inputs;
  * the first-conv restore is a ``where`` over two weight sets
    (openaimodel.py:393-408 becomes a select, not a weight swap);
  * CFG runs cond+uncond as one doubled batch;
  * the PLMS Adams-Bashforth history lives in the scan carry; the step-0
    Heun warm start is unrolled outside the scan.

The known reference bug where DDIM's uncond input omits ``relations``
(ddim.py:116) is fixed: relations are passed in both CFG halves, matching
PLMS (plms.py:118-121).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.schedules import (
    DDPMSchedule,
    alpha_generator,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)


class StepTables(NamedTuple):
    """Per-step coefficient tables in *loop order* (t descending)."""

    t: jnp.ndarray              # (S,) current timestep
    t_next: jnp.ndarray         # (S,) next (smaller) timestep, for Heun
    a_t: jnp.ndarray            # (S,) alpha_cumprod at t
    a_prev: jnp.ndarray         # (S,)
    sigma: jnp.ndarray          # (S,)
    sqrt_one_minus_at: jnp.ndarray  # (S,)
    fuser_scale: jnp.ndarray    # (S,) grounding alpha schedule
    use_sd_conv: jnp.ndarray    # (S,) bool: alpha == 0 -> SD first conv


def make_step_tables(
    schedule: DDPMSchedule,
    steps: int,
    eta: float = 0.0,
    alpha_type=None,
) -> StepTables:
    ddim_ts = make_ddim_timesteps("uniform", steps, schedule.num_timesteps)
    # range(0, T, T//steps) can yield ceil(T / (T//steps)) entries when steps
    # does not divide T — everything below follows the actual table length
    n_steps = len(ddim_ts)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
        schedule.alphas_cumprod.astype(np.float64), ddim_ts, eta
    )
    time_range = ddim_ts[::-1].copy()
    t_next = np.concatenate([time_range[1:], time_range[-1:]])
    if alpha_type is not None:
        fuser = np.asarray(alpha_generator(n_steps, list(alpha_type)), dtype=np.float32)
    else:
        fuser = np.ones(n_steps, dtype=np.float32)
    f32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.float32))
    return StepTables(
        t=jnp.asarray(time_range, dtype=jnp.int32),
        t_next=jnp.asarray(t_next, dtype=jnp.int32),
        a_t=f32(alphas[::-1]),
        a_prev=f32(alphas_prev[::-1]),
        sigma=f32(sigmas[::-1]),
        sqrt_one_minus_at=f32(np.sqrt(1.0 - alphas[::-1])),
        fuser_scale=f32(fuser),
        use_sd_conv=jnp.asarray((fuser == 0) & (alpha_type is not None)),
    )


def _update(x, e_t, a_t, a_prev, sigma, sqrt_1m_at, noise):
    """x_prev and pred_x0 from an eps estimate (plms.py:126-140)."""
    pred_x0 = (x - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) * e_t
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise, pred_x0


@dataclasses.dataclass(frozen=True)
class InpaintBlend:
    """Known-region replacement each step (ddim.py:98-102)."""

    mask: jnp.ndarray  # (B, H, W, C) 1 = keep original
    z0: jnp.ndarray    # clean latent


def _q_sample(schedule_dev, z0, t, rng):
    noise = jax.random.normal(rng, z0.shape, z0.dtype)
    sa = schedule_dev["sqrt_alphas_cumprod"][t].reshape(-1, 1, 1, 1)
    s1m = schedule_dev["sqrt_one_minus_alphas_cumprod"][t].reshape(-1, 1, 1, 1)
    return sa * z0 + s1m * noise


def _schedule_device(schedule: DDPMSchedule):
    return {
        "sqrt_alphas_cumprod": jnp.asarray(schedule.sqrt_alphas_cumprod),
        "sqrt_one_minus_alphas_cumprod": jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod),
    }


def _alpha_segments(tables: StepTables, denoise_skip_fn, cfg_on=None):
    """Split the step range into runs of constant (fuser_scale == 0, cfg_on).

    The grounding alpha table is a trace-time constant (alpha_generator:
    grounded for the leading stage, plain SD after), so the steps where the
    gated fusers contribute exactly 0 are statically known; running those in
    their own scan with a reduced UNet body elides the fuser attention + FF
    bit-exactly. ``cfg_on`` (guidance-interval mode, arXiv:2404.07724) adds
    a second static predicate: segments with cfg_on == False run a
    single-batch cond-only denoise variant at half the CFG batch. With no
    skip variant and no interval this is one segment and the compiled
    program is unchanged. Returns (start, end, is_zero, is_cfg) tuples."""
    steps = int(tables.t.shape[0])
    zero = (np.asarray(tables.fuser_scale) == 0 if denoise_skip_fn is not None
            else np.zeros(steps, dtype=bool))
    con = (np.ones(steps, dtype=bool) if cfg_on is None
           else np.asarray(cfg_on, dtype=bool))
    segs = []
    start = 0
    for i in range(1, steps + 1):
        if i == steps or (zero[i], con[i]) != (zero[start], con[start]):
            segs.append((start, i, bool(zero[start]), bool(con[start])))
            start = i
    return segs


def _segment_denoisers(denoise_fn, denoise_skip_fn, denoise_nocfg_fn,
                       denoise_nocfg_skip_fn):
    """(is_zero, is_cfg) -> denoise fn, shared by all three samplers so the
    segment semantics cannot drift between them."""
    def pick(is_zero: bool, is_cfg: bool):
        if is_cfg or denoise_nocfg_fn is None:
            return denoise_skip_fn if is_zero else denoise_fn
        return denoise_nocfg_skip_fn if is_zero else denoise_nocfg_fn
    return pick


def _resize_cache(cache, b: int, to_cfg: bool):
    """Adapt an encoder cache across a guidance-interval segment boundary:
    CFG segments carry (2B, ...) features ([cond; uncond]), cond-only
    segments (B, ...). The transformed values are placeholders ONLY — the
    first step of every segment is forced key (InferencePipeline._key_steps)
    so a resized cache is refreshed before any propagated step reads it;
    the resize just keeps the scan carry shape consistent."""
    if to_cfg:
        return jax.tree_util.tree_map(
            lambda a: jnp.concatenate([a, a]) if a.shape[0] == b else a,
            cache)
    return jax.tree_util.tree_map(
        lambda a: a[:b] if a.shape[0] == 2 * b else a, cache)


def plms_sample(
    denoise_fn,
    tables: StepTables,
    x_init: jnp.ndarray,
    schedule: Optional[DDPMSchedule] = None,
    inpaint: Optional[InpaintBlend] = None,
    rng: Optional[jax.Array] = None,
    denoise_skip_fn=None,
    cache_init=None,
    key_steps=None,
    denoise_nocfg_fn=None,
    denoise_nocfg_skip_fn=None,
    cfg_on=None,
):
    """PLMS (pseudo linear multistep, AB up to 4th order) sampling.

    denoise_fn(x, t, fuser_scale, use_sd_conv) -> eps; CFG is the caller's
    concern (see pipeline.inference.make_cfg_denoiser). Deterministic: PLMS
    requires eta=0 so no per-step noise; ``rng`` is only used for the
    inpainting q_sample blend.

    denoise_skip_fn: optional same-signature variant with the gated fusers
    statically elided; used for the (trace-time constant) steps where
    fuser_scale == 0 — bit-exact, since those fusers contribute x + 0*(...).

    cache_init/key_steps: encoder-propagation mode (arXiv:2312.09608,
    opt-in, approximate). ``key_steps`` is a (S,) bool array; on False steps
    the denoise fns are called with the carried encoder cache and skip the
    UNet encoder. In this mode both denoise fns must accept
    ``cache=..., is_key=...`` and return ``(eps, new_cache)``.

    denoise_nocfg_fn/denoise_nocfg_skip_fn/cfg_on: guidance-interval mode
    (arXiv:2404.07724) — steps with cfg_on == False run the cond-only
    variants (half the CFG batch). Composes with the encoder cache: the
    carried cache is batch-resized at segment boundaries (_resize_cache)
    and boundary steps are forced key by the pipeline's key_steps table.
    """
    steps = int(tables.t.shape[0])
    b = x_init.shape[0]
    sched_dev = _schedule_device(schedule) if schedule is not None else None
    cached_mode = cache_init is not None

    def blend(x, t, rng_step):
        if inpaint is None:
            return x
        img_orig = _q_sample(sched_dev, inpaint.z0, jnp.full((b,), t), rng_step)
        return img_orig * inpaint.mask + (1.0 - inpaint.mask) * x

    zero_noise = jnp.zeros_like(x_init)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, steps)

    # One scan per alpha segment, with the step-0 Heun warm start folded in
    # via lax.cond so the UNet body is instantiated at most three times in
    # the compiled program (full main + warm-start + reduced main) instead of
    # once per unrolled call — compile time for the 50-step program stays flat.
    def make_body(dn, allow_warm: bool):
        def body(carry, inp):
            if cached_mode:
                x, hist, count, cache = carry
                (t, t_nxt, a_t, a_prev, sigma, s1m, fscale, use_sd, rng_step,
                 is_key) = inp
            else:
                x, hist, count = carry
                (t, t_nxt, a_t, a_prev, sigma, s1m, fscale, use_sd,
                 rng_step) = inp
            x = blend(x, t, rng_step)
            tv = jnp.full((b,), t)
            if cached_mode:
                e_t, cache = dn(x, tv, fscale, use_sd, cache=cache,
                                is_key=is_key)
            else:
                e_t = dn(x, tv, fscale, use_sd)

            def heun(_):
                # pseudo improved Euler (plms.py:144-150)
                x_mid, _ = _update(x, e_t, a_t, a_prev, sigma, s1m, zero_noise)
                if cached_mode:
                    # adjacent-t eval: reuse the cache just refreshed by the
                    # (always-key) step-0 forward
                    e_next, _ = dn(x_mid, jnp.full((b,), t_nxt), fscale,
                                   use_sd, cache=cache,
                                   is_key=jnp.asarray(False))
                else:
                    e_next = dn(x_mid, jnp.full((b,), t_nxt), fscale, use_sd)
                return (e_t + e_next) / 2

            def adams_bashforth(_):
                return jax.lax.switch(
                    jnp.clip(count, 1, 3) - 1,
                    [
                        lambda e, h: (3 * e - h[0]) / 2,
                        lambda e, h: (23 * e - 16 * h[0] + 5 * h[1]) / 12,
                        lambda e, h: (55 * e - 59 * h[0] + 37 * h[1] - 9 * h[2]) / 24,
                    ],
                    e_t,
                    hist,
                )

            if allow_warm:
                e_prime = jax.lax.cond(count == 0, heun, adams_bashforth, None)
            else:
                # later segments statically start at count >= 1
                e_prime = adams_bashforth(None)
            x_new, _ = _update(x, e_prime, a_t, a_prev, sigma, s1m, zero_noise)
            hist = jnp.stack([e_t, hist[0], hist[1]])
            if cached_mode:
                return (x_new, hist, count + 1, cache), None
            return (x_new, hist, count + 1), None
        return body

    hist0 = jnp.stack([zero_noise, zero_noise, zero_noise])
    count0 = jnp.asarray(0, dtype=jnp.int32)
    xs = (
        tables.t, tables.t_next, tables.a_t, tables.a_prev,
        tables.sigma, tables.sqrt_one_minus_at, tables.fuser_scale,
        tables.use_sd_conv, rngs,
    )
    if cached_mode:
        xs = xs + (jnp.asarray(np.asarray(key_steps, dtype=bool)),)
        carry = (x_init, hist0, count0, cache_init)
    else:
        carry = (x_init, hist0, count0)
    pick = _segment_denoisers(denoise_fn, denoise_skip_fn, denoise_nocfg_fn,
                              denoise_nocfg_skip_fn)
    prev_cfg = None
    for a, end, is_zero, is_cfg in _alpha_segments(tables, denoise_skip_fn,
                                                   cfg_on):
        if cached_mode and prev_cfg is not None and is_cfg != prev_cfg:
            carry = carry[:-1] + (_resize_cache(carry[-1], b, is_cfg),)
        prev_cfg = is_cfg
        carry, _ = jax.lax.scan(
            make_body(pick(is_zero, is_cfg), allow_warm=(a == 0)), carry,
            tuple(v[a:end] for v in xs))
    return carry[0]


def ddim_sample(
    denoise_fn,
    tables: StepTables,
    x_init: jnp.ndarray,
    schedule: Optional[DDPMSchedule] = None,
    inpaint: Optional[InpaintBlend] = None,
    rng: Optional[jax.Array] = None,
    denoise_skip_fn=None,
    cache_init=None,
    key_steps=None,
    denoise_nocfg_fn=None,
    denoise_nocfg_skip_fn=None,
    cfg_on=None,
):
    """DDIM sampling (ddim.py:65-135); eta>0 adds sigma-scaled noise.

    denoise_skip_fn: as in plms_sample — gated-fuser-free variant for the
    statically known fuser_scale == 0 steps.
    cache_init/key_steps: encoder-propagation mode, see plms_sample.
    denoise_nocfg_*/cfg_on: guidance-interval mode, see plms_sample."""
    steps = int(tables.t.shape[0])
    b = x_init.shape[0]
    sched_dev = _schedule_device(schedule) if schedule is not None else None
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, steps)
    stochastic = bool(np.any(np.asarray(tables.sigma) > 0))
    cached_mode = cache_init is not None

    def make_body(dn):
        def body(carry, inp):
            if cached_mode:
                x, cache = carry
                (t, a_t, a_prev, sigma, s1m, fscale, use_sd, rng_step,
                 is_key) = inp
            else:
                x = carry
                (t, a_t, a_prev, sigma, s1m, fscale, use_sd, rng_step) = inp
            r_blend, r_noise = jax.random.split(rng_step)
            if inpaint is not None:
                img_orig = _q_sample(sched_dev, inpaint.z0, jnp.full((b,), t), r_blend)
                x = img_orig * inpaint.mask + (1.0 - inpaint.mask) * x
            tv = jnp.full((b,), t)
            if cached_mode:
                e_t, cache = dn(x, tv, fscale, use_sd, cache=cache,
                                is_key=is_key)
            else:
                e_t = dn(x, tv, fscale, use_sd)
            noise = (
                jax.random.normal(r_noise, x.shape, x.dtype)
                if stochastic
                else jnp.zeros_like(x)
            )
            x_new, _ = _update(x, e_t, a_t, a_prev, sigma, s1m, noise)
            return ((x_new, cache) if cached_mode else x_new), None
        return body

    xs = (
        tables.t, tables.a_t, tables.a_prev, tables.sigma,
        tables.sqrt_one_minus_at, tables.fuser_scale, tables.use_sd_conv, rngs,
    )
    if cached_mode:
        xs = xs + (jnp.asarray(np.asarray(key_steps, dtype=bool)),)
        carry = (x_init, cache_init)
    else:
        carry = x_init
    pick = _segment_denoisers(denoise_fn, denoise_skip_fn, denoise_nocfg_fn,
                              denoise_nocfg_skip_fn)
    prev_cfg = None
    for a, end, is_zero, is_cfg in _alpha_segments(tables, denoise_skip_fn,
                                                   cfg_on):
        if cached_mode and prev_cfg is not None and is_cfg != prev_cfg:
            carry = (carry[0], _resize_cache(carry[1], b, is_cfg))
        prev_cfg = is_cfg
        carry, _ = jax.lax.scan(make_body(pick(is_zero, is_cfg)), carry,
                                tuple(v[a:end] for v in xs))
    return carry[0] if cached_mode else carry


def dpm_sample(
    denoise_fn,
    tables: StepTables,
    x_init: jnp.ndarray,
    schedule: Optional[DDPMSchedule] = None,
    inpaint: Optional[InpaintBlend] = None,
    rng: Optional[jax.Array] = None,
    denoise_skip_fn=None,
    cache_init=None,
    key_steps=None,
    denoise_nocfg_fn=None,
    denoise_nocfg_skip_fn=None,
    cfg_on=None,
):
    """DPM-Solver++(2M) (Lu et al., arXiv:2211.01095), data-prediction
    multistep form — a 2nd-order ODE solver in log-SNR time that reaches
    PLMS-50-class sample quality in ~15-25 steps. No reference counterpart
    (GLIGEN ships PLMS/DDIM only, plms.py/ddim.py); deterministic (no
    per-step noise). Supports the same static machinery as plms_sample:
    skip-gated alpha segments, guidance-interval segments, and the encoder
    cache carry.

    Update (x0-prediction): with alpha=sqrt(a), sigma=sqrt(1-a),
    lambda=log(alpha/sigma), h = lambda_prev - lambda_t:
      x0_t   = (x - sigma_t * eps) / alpha_t
      D      = x0_t                                  (first step)
             = (1 + 1/(2r)) x0_t - 1/(2r) x0_{t-1},  r = h_{t-1}/h
      x_prev = (sigma_prev/sigma_t) x - alpha_prev * expm1(-h) * D
    """
    steps = int(tables.t.shape[0])
    b = x_init.shape[0]
    sched_dev = _schedule_device(schedule) if schedule is not None else None
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    rngs = jax.random.split(rng, steps)
    cached_mode = cache_init is not None
    if bool(np.any(np.asarray(tables.sigma) > 0)):
        raise ValueError(
            "dpm_sample is a deterministic ODE solver: eta>0 step tables "
            "are unsupported (the sigma noise would be silently dropped) — "
            "use ddim_sample for stochastic sampling")

    # per-step log-SNR tables (f32 numpy -> device constants)
    a_t = np.asarray(tables.a_t, dtype=np.float64)
    a_prev = np.asarray(tables.a_prev, dtype=np.float64)
    lam_t = 0.5 * np.log(a_t / (1.0 - a_t))
    lam_p = 0.5 * np.log(a_prev / np.maximum(1.0 - a_prev, 1e-12))
    f32 = lambda v: jnp.asarray(np.asarray(v, dtype=np.float32))

    def make_body(dn, allow_warm: bool):
        def body(carry, inp):
            if cached_mode:
                x, x0_prev, lam_last, count, cache = carry
                (t, at, ap, lt, lp, fscale, use_sd, rng_step, is_key) = inp
            else:
                x, x0_prev, lam_last, count = carry
                (t, at, ap, lt, lp, fscale, use_sd, rng_step) = inp
            if inpaint is not None:
                img_orig = _q_sample(sched_dev, inpaint.z0, jnp.full((b,), t),
                                     rng_step)
                x = img_orig * inpaint.mask + (1.0 - inpaint.mask) * x
            tv = jnp.full((b,), t)
            if cached_mode:
                e_t, cache = dn(x, tv, fscale, use_sd, cache=cache,
                                is_key=is_key)
            else:
                e_t = dn(x, tv, fscale, use_sd)
            alpha_t, sigma_t = jnp.sqrt(at), jnp.sqrt(1.0 - at)
            alpha_p, sigma_p = jnp.sqrt(ap), jnp.sqrt(
                jnp.maximum(1.0 - ap, 0.0))
            x0 = (x - sigma_t * e_t) / alpha_t
            h = lp - lt
            h_last = lt - lam_last

            def second(_):
                # 1/(2r) = h/(2*h_last); degenerate h_last (duplicated
                # timesteps at very fine discretizations) falls back to
                # first order instead of 0/0 -> NaN
                c = jnp.where(h_last > 1e-8,
                              h / (2.0 * jnp.maximum(h_last, 1e-8)), 0.0)
                return (1.0 + c) * x0 - c * x0_prev

            if allow_warm:
                d = jax.lax.cond(count == 0, lambda _: x0, second, None)
            else:
                d = second(None)
            x_new = (sigma_p / sigma_t) * x - alpha_p * jnp.expm1(-h) * d
            new_carry = (x_new, x0, lt, count + 1)
            if cached_mode:
                new_carry = new_carry + (cache,)
            return new_carry, None
        return body

    xs = (tables.t, f32(a_t), f32(a_prev), f32(lam_t), f32(lam_p),
          tables.fuser_scale, tables.use_sd_conv, rngs)
    if cached_mode:
        xs = xs + (jnp.asarray(np.asarray(key_steps, dtype=bool)),)
        carry = (x_init, jnp.zeros_like(x_init), jnp.float32(0.0),
                 jnp.asarray(0, jnp.int32), cache_init)
    else:
        carry = (x_init, jnp.zeros_like(x_init), jnp.float32(0.0),
                 jnp.asarray(0, jnp.int32))
    pick = _segment_denoisers(denoise_fn, denoise_skip_fn, denoise_nocfg_fn,
                              denoise_nocfg_skip_fn)
    prev_cfg = None
    for a, end, is_zero, is_cfg in _alpha_segments(tables, denoise_skip_fn,
                                                   cfg_on):
        if cached_mode and prev_cfg is not None and is_cfg != prev_cfg:
            carry = carry[:-1] + (_resize_cache(carry[-1], b, is_cfg),)
        prev_cfg = is_cfg
        carry, _ = jax.lax.scan(
            make_body(pick(is_zero, is_cfg), allow_warm=(a == 0)), carry,
            tuple(v[a:end] for v in xs))
    return carry[0]
