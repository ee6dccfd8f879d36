"""Parameter initializers producing torch-state-dict-shaped pytrees.

Shapes follow the JAX layouts in ops/nn.py (linear kernels (in, out), conv
kernels HWIO). Distributions mimic torch defaults (kaiming-uniform with
fan_in) so training-from-scratch behaves comparably; pretrained use always
goes through checkpoint/convert.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def linear_p(key, din: int, dout: int, bias: bool = True, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(din)
    p = {"weight": jax.random.uniform(kw, (din, dout), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (dout,), dtype, -bound, bound)
    return p


def conv_p(key, kh: int, kw_: int, cin: int, cout: int, bias: bool = True,
           dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = kh * kw_ * cin
    bound = 1.0 / np.sqrt(fan_in)
    p = {"weight": jax.random.uniform(kw, (kh, kw_, cin, cout), dtype, -bound, bound)}
    if bias:
        p["bias"] = jax.random.uniform(kb, (cout,), dtype, -bound, bound)
    return p


def norm_p(c: int, dtype=jnp.float32):
    return {"weight": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def scalar_p(value: float = 0.0, dtype=jnp.float32):
    return jnp.asarray(value, dtype)
