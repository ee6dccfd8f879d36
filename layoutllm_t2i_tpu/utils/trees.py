"""Pytree helpers."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast floating-point leaves to ``dtype`` (params are stored in bf16 on
    TPU so HBM reads in the hot loop move half the bytes)."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def override_subtree(params: dict, path, value):
    """Return a copy of ``params`` with the nested ``path`` replaced."""
    if not path:
        return value
    head, rest = path[0], path[1:]
    out = dict(params)
    out[head] = override_subtree(params[head], rest, value)
    return out


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree.leaves(tree) if hasattr(x, "size"))
