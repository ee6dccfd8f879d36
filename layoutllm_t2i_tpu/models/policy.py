"""Policy network + aesthetic predictor.

Reference: models/policy.py:11-33 (a single Linear(768->128) over frozen CLIP
text features) and tools/aesthetic.py:9-56 (5-layer MLP on normalized CLIP
image embeddings, LAION sac+logos+ava1-l14-linearMSE weights).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn
from . import initializers as init


def policy_apply(params, emb):
    """emb: (N, in_dim) CLIP text features -> (N, embedding_size)."""
    return nn.linear(params["linear"], emb)


def policy_scores(params, emb_prompt, emb_cand):
    """Scores = policy(prompt) @ policy(cand)^T (txt2img.py:472-474)."""
    ep = policy_apply(params, emb_prompt)
    ec = policy_apply(params, emb_cand)
    return ep @ ec.T


def init_policy_params(key, in_dim: int = 768, embedding_size: int = 128):
    return {"linear": init.linear_p(key, in_dim, embedding_size)}


# ---------------------------------------------------------------------------
# aesthetic predictor (tools/aesthetic.py) — torch keys layers.{0,2,4,6,8}

_AES_DIMS = [(768, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
_AES_KEYS = ["0", "2", "4", "6", "8"]


def aesthetic_apply(params, x):
    """x: (N, 768) L2-normalized CLIP image embedding -> (N,) score.
    The reference MLP has its ReLUs commented out — it is a linear stack with
    (inference-inactive) dropout between layers."""
    h = x
    for k in _AES_KEYS:
        h = nn.linear(params["layers"][k], h)
    return h[..., 0]


def init_aesthetic_params(key, input_size: int = 768):
    dims = [(input_size, 1024)] + _AES_DIMS[1:]
    ks = jax.random.split(key, len(dims))
    return {
        "layers": {
            k: init.linear_p(kk, din, dout)
            for k, kk, (din, dout) in zip(_AES_KEYS, ks, dims)
        }
    }


def l2_normalize(a, axis: int = -1, eps: float = 0.0):
    """normalized() from tools/aesthetic.py:51-56 (zero norms pass through)."""
    norm = jnp.linalg.norm(a, ord=2, axis=axis, keepdims=True)
    norm = jnp.where(norm == 0, 1.0, norm)
    return a / norm
