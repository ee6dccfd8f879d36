"""FID: JAX InceptionV3 pool3 features + Frechet distance.

The reference repo reports FID only via the paper (BASELINE.md); it contains
no FID code. This module closes the quality gate with a self-contained
implementation:

  * ``InceptionV3`` feature extractor (pool3, 2048-d) re-implemented as pure
    functions over a parameter pytree whose keys mirror the torchvision
    ``inception_v3`` state_dict (Conv2d_1a_3x3.conv / .bn, Mixed_5b.branch1x1
    ...), so standard FID weights (pytorch-fid's pt_inception, or torchvision
    IMAGENET1K) convert mechanically with checkpoint.convert.nest_state_dict —
    no torch at eval time;
  * activation statistics + the Frechet distance
    ||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) with the standard
    eps-regularized matrix sqrt (scipy.linalg.sqrtm on host).

When no converted Inception checkpoint is available (this image has no
network access), ``fid_score`` also accepts features from any extractor —
the NSS1K runner falls back to the CLIP vision tower ("CLIP-FID"), and the
number is labeled accordingly.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import nn


# ---------------------------------------------------------------------------
# InceptionV3 (torchvision graph, aux logits unused for features)


def _bn(p, x, eps=1e-3):
    mean = p["running_mean"].astype(jnp.float32)
    var = p["running_var"].astype(jnp.float32)
    w = p["weight"].astype(jnp.float32)
    b = p["bias"].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * w + b
    return y.astype(x.dtype)


def _basic_conv(p, x, stride=1, padding=0):
    x = nn.conv2d(p["conv"], x, stride=stride, padding=padding)
    return jax.nn.relu(_bn(p["bn"], x))


def _maxpool3x3s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


def _avgpool3x3s1p1(x):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / cnt


def _inception_a(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b5 = _basic_conv(p["branch5x5_1"], x)
    b5 = _basic_conv(p["branch5x5_2"], b5, padding=2)
    b3 = _basic_conv(p["branch3x3dbl_1"], x)
    b3 = _basic_conv(p["branch3x3dbl_2"], b3, padding=1)
    b3 = _basic_conv(p["branch3x3dbl_3"], b3, padding=1)
    bp = _basic_conv(p["branch_pool"], _avgpool3x3s1p1(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _basic_conv(p["branch3x3"], x, stride=2)
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd, padding=1)
    bd = _basic_conv(p["branch3x3dbl_3"], bd, stride=2)
    return jnp.concatenate([b3, bd, _maxpool3x3s2(x)], axis=-1)


def _inception_c(p, x):
    pad17 = [(0, 0), (3, 3)]
    pad71 = [(3, 3), (0, 0)]
    b1 = _basic_conv(p["branch1x1"], x)
    b7 = _basic_conv(p["branch7x7_1"], x)
    b7 = _basic_conv(p["branch7x7_2"], b7, padding=pad17)
    b7 = _basic_conv(p["branch7x7_3"], b7, padding=pad71)
    bd = _basic_conv(p["branch7x7dbl_1"], x)
    bd = _basic_conv(p["branch7x7dbl_2"], bd, padding=pad71)
    bd = _basic_conv(p["branch7x7dbl_3"], bd, padding=pad17)
    bd = _basic_conv(p["branch7x7dbl_4"], bd, padding=pad71)
    bd = _basic_conv(p["branch7x7dbl_5"], bd, padding=pad17)
    bp = _basic_conv(p["branch_pool"], _avgpool3x3s1p1(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = _basic_conv(p["branch3x3_2"], b3, stride=2)
    b7 = _basic_conv(p["branch7x7x3_1"], x)
    b7 = _basic_conv(p["branch7x7x3_2"], b7, padding=[(0, 0), (3, 3)])
    b7 = _basic_conv(p["branch7x7x3_3"], b7, padding=[(3, 3), (0, 0)])
    b7 = _basic_conv(p["branch7x7x3_4"], b7, stride=2)
    return jnp.concatenate([b3, b7, _maxpool3x3s2(x)], axis=-1)


def _inception_e(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([
        _basic_conv(p["branch3x3_2a"], b3, padding=[(0, 0), (1, 1)]),
        _basic_conv(p["branch3x3_2b"], b3, padding=[(1, 1), (0, 0)]),
    ], axis=-1)
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd, padding=1)
    bd = jnp.concatenate([
        _basic_conv(p["branch3x3dbl_3a"], bd, padding=[(0, 0), (1, 1)]),
        _basic_conv(p["branch3x3dbl_3b"], bd, padding=[(1, 1), (0, 0)]),
    ], axis=-1)
    bp = _basic_conv(p["branch_pool"], _avgpool3x3s1p1(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_pool3(params, x):
    """x: (B, 299, 299, 3) in [-1, 1] -> (B, 2048) pool3 features."""
    x = _basic_conv(params["Conv2d_1a_3x3"], x, stride=2)
    x = _basic_conv(params["Conv2d_2a_3x3"], x)
    x = _basic_conv(params["Conv2d_2b_3x3"], x, padding=1)
    x = _maxpool3x3s2(x)
    x = _basic_conv(params["Conv2d_3b_1x1"], x)
    x = _basic_conv(params["Conv2d_4a_3x3"], x)
    x = _maxpool3x3s2(x)
    for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        x = _inception_a(params[name], x)
    x = _inception_b(params["Mixed_6a"], x)
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _inception_c(params[name], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x)
    x = _inception_e(params["Mixed_7c"], x)
    return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)


# -- init (random; real FID weights load via checkpoint.convert) -------------


def _init_basic_conv(key, kh, kw, cin, cout):
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * 0.05
    return {
        "conv": {"weight": w},
        "bn": {
            "weight": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
            "running_mean": jnp.zeros((cout,)), "running_var": jnp.ones((cout,)),
        },
    }


def init_inception_params(key):
    ks = iter(jax.random.split(key, 128))
    bc = lambda kh, kw, ci, co: _init_basic_conv(next(ks), kh, kw, ci, co)
    p = {
        "Conv2d_1a_3x3": bc(3, 3, 3, 32),
        "Conv2d_2a_3x3": bc(3, 3, 32, 32),
        "Conv2d_2b_3x3": bc(3, 3, 32, 64),
        "Conv2d_3b_1x1": bc(1, 1, 64, 80),
        "Conv2d_4a_3x3": bc(3, 3, 80, 192),
    }

    def inc_a(cin, pool):
        return {
            "branch1x1": bc(1, 1, cin, 64),
            "branch5x5_1": bc(1, 1, cin, 48), "branch5x5_2": bc(5, 5, 48, 64),
            "branch3x3dbl_1": bc(1, 1, cin, 64),
            "branch3x3dbl_2": bc(3, 3, 64, 96),
            "branch3x3dbl_3": bc(3, 3, 96, 96),
            "branch_pool": bc(1, 1, cin, pool),
        }

    def inc_c(cin, c7):
        return {
            "branch1x1": bc(1, 1, cin, 192),
            "branch7x7_1": bc(1, 1, cin, c7), "branch7x7_2": bc(1, 7, c7, c7),
            "branch7x7_3": bc(7, 1, c7, 192),
            "branch7x7dbl_1": bc(1, 1, cin, c7),
            "branch7x7dbl_2": bc(7, 1, c7, c7),
            "branch7x7dbl_3": bc(1, 7, c7, c7),
            "branch7x7dbl_4": bc(7, 1, c7, c7),
            "branch7x7dbl_5": bc(1, 7, c7, 192),
            "branch_pool": bc(1, 1, cin, 192),
        }

    def inc_e(cin):
        return {
            "branch1x1": bc(1, 1, cin, 320),
            "branch3x3_1": bc(1, 1, cin, 384),
            "branch3x3_2a": bc(1, 3, 384, 384), "branch3x3_2b": bc(3, 1, 384, 384),
            "branch3x3dbl_1": bc(1, 1, cin, 448),
            "branch3x3dbl_2": bc(3, 3, 448, 384),
            "branch3x3dbl_3a": bc(1, 3, 384, 384),
            "branch3x3dbl_3b": bc(3, 1, 384, 384),
            "branch_pool": bc(1, 1, cin, 192),
        }

    p["Mixed_5b"] = inc_a(192, 32)
    p["Mixed_5c"] = inc_a(256, 64)
    p["Mixed_5d"] = inc_a(288, 64)
    p["Mixed_6a"] = {
        "branch3x3": bc(3, 3, 288, 384),
        "branch3x3dbl_1": bc(1, 1, 288, 64),
        "branch3x3dbl_2": bc(3, 3, 64, 96),
        "branch3x3dbl_3": bc(3, 3, 96, 96),
    }
    for name in ("Mixed_6b",):
        p[name] = inc_c(768, 128)
    p["Mixed_6c"] = inc_c(768, 160)
    p["Mixed_6d"] = inc_c(768, 160)
    p["Mixed_6e"] = inc_c(768, 192)
    p["Mixed_7a"] = {
        "branch3x3_1": bc(1, 1, 768, 192), "branch3x3_2": bc(3, 3, 192, 320),
        "branch7x7x3_1": bc(1, 1, 768, 192),
        "branch7x7x3_2": bc(1, 7, 192, 192),
        "branch7x7x3_3": bc(7, 1, 192, 192),
        "branch7x7x3_4": bc(3, 3, 192, 192),
    }
    p["Mixed_7b"] = inc_e(1280)
    p["Mixed_7c"] = inc_e(2048)
    return p


def load_inception_checkpoint(path: str):
    """Converted torchvision/pytorch-fid ``inception_v3`` .pth -> pytree
    (drops fc/AuxLogits; the feature path needs neither)."""
    import torch

    from ..checkpoint.convert import nest_state_dict

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v for k, v in sd.items()
          if not k.startswith(("fc.", "AuxLogits."))
          and not k.endswith("num_batches_tracked")}
    return nest_state_dict(sd)


# ---------------------------------------------------------------------------
# features + Frechet distance


@functools.partial(jax.jit, static_argnums=())
def _features_jit(params, imgs):
    return inception_pool3(params, imgs)


def inception_features(params, images01: np.ndarray, batch: int = 16) -> np.ndarray:
    """images01: (N, H, W, 3) float in [0, 1] -> (N, 2048) features.
    Bilinear-resized to 299 and scaled to [-1, 1] (pytorch-fid preprocessing)."""
    feats = []
    for i in range(0, len(images01), batch):
        chunk = jnp.asarray(images01[i:i + batch], jnp.float32)
        chunk = jax.image.resize(chunk, (chunk.shape[0], 299, 299, 3), "bilinear")
        chunk = chunk * 2.0 - 1.0
        feats.append(np.asarray(_features_jit(params, chunk)))
    return np.concatenate(feats, axis=0)


def compute_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2}); standard eps jitter when
    the product is singular (same guard as pytorch-fid)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid_score(features_a: np.ndarray, features_b: np.ndarray) -> float:
    return frechet_distance(*compute_stats(features_a),
                            *compute_stats(features_b))
