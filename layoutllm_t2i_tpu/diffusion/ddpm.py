"""Forward-noising (training side) of the latent diffusion process.

Reference: GLIGEN/ldm/models/diffusion/ldm.py:19-22 (q_sample) over the
schedule registered in ddpm.py:19-54. Sampling-side math lives in samplers.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.schedules import DDPMSchedule


def q_sample(schedule: DDPMSchedule, x_start, t, noise):
    """x_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps, with t: (B,) ints."""
    sa = jnp.asarray(schedule.sqrt_alphas_cumprod)[t]
    s1m = jnp.asarray(schedule.sqrt_one_minus_alphas_cumprod)[t]
    shape = (-1,) + (1,) * (x_start.ndim - 1)
    return sa.reshape(shape) * x_start + s1m.reshape(shape) * noise
