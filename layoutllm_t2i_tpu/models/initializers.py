"""Parameter initializers producing torch-state-dict-shaped pytrees.

Shapes follow the JAX layouts in ops/nn.py (linear kernels (in, out), conv
kernels HWIO). Distributions mimic torch defaults (kaiming-uniform with
fan_in) so training-from-scratch behaves comparably; pretrained use always
goes through checkpoint/convert.py.

Leaves are sampled with NumPy on the host (deterministic in the jax key):
eager per-tensor jax ops would pay one kernel compile each (~1700 for the SD
UNet) and, on a remote TPU, one tunnel dispatch each. Callers move the
finished tree to device in one bulk transfer (utils.trees.materialize_params).
"""
from __future__ import annotations

import numpy as np
import jax


def _rng(key) -> np.random.Generator:
    data = np.asarray(jax.random.key_data(key)).ravel()
    return np.random.default_rng([int(x) for x in data])


def linear_p(key, din: int, dout: int, bias: bool = True, dtype=np.float32):
    g = _rng(key)
    bound = 1.0 / np.sqrt(din)
    p = {"weight": g.uniform(-bound, bound, (din, dout)).astype(dtype)}
    if bias:
        p["bias"] = g.uniform(-bound, bound, (dout,)).astype(dtype)
    return p


def conv_p(key, kh: int, kw_: int, cin: int, cout: int, bias: bool = True,
           dtype=np.float32):
    g = _rng(key)
    bound = 1.0 / np.sqrt(kh * kw_ * cin)
    p = {"weight": g.uniform(-bound, bound, (kh, kw_, cin, cout)).astype(dtype)}
    if bias:
        p["bias"] = g.uniform(-bound, bound, (cout,)).astype(dtype)
    return p


def normal_p(key, shape, scale: float = 0.02, dtype=np.float32):
    return (_rng(key).standard_normal(shape) * scale).astype(dtype)


def norm_p(c: int, dtype=np.float32):
    return {"weight": np.ones((c,), dtype), "bias": np.zeros((c,), dtype)}


def scalar_p(value: float = 0.0, dtype=np.float32):
    return np.asarray(value, dtype)


def zeros_p(shape, dtype=np.float32):
    return np.zeros(shape, dtype)
