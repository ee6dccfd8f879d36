"""FID: Frechet-distance math (closed forms) + InceptionV3 feature extractor."""
import numpy as np
import jax
import pytest

from layoutllm_t2i_tpu.eval.fid import (
    compute_stats, fid_score, frechet_distance, inception_features,
    init_inception_params,
)


def test_frechet_identical_is_zero(rng):
    f = rng.standard_normal((200, 8)).astype(np.float64)
    mu, s = compute_stats(f)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-8


def test_frechet_diagonal_closed_form():
    # diagonal Gaussians: d^2 = |mu1-mu2|^2 + sum (sqrt(v1)-sqrt(v2))^2
    mu1 = np.array([0.0, 1.0])
    mu2 = np.array([1.0, -1.0])
    s1 = np.diag([1.0, 4.0])
    s2 = np.diag([9.0, 1.0])
    expected = 1.0 + 4.0 + (1 - 3) ** 2 + (2 - 1) ** 2
    assert abs(frechet_distance(mu1, s1, mu2, s2) - expected) < 1e-8


def test_fid_score_orders_distributions(rng):
    base = rng.standard_normal((300, 6))
    near = base + 0.1 * rng.standard_normal((300, 6))
    far = base + 3.0 + rng.standard_normal((300, 6))
    assert fid_score(base, near) < fid_score(base, far)


@pytest.mark.slow
def test_inception_pool3_shape(rng):
    """Full 299^2 forward through the (random-init) InceptionV3 graph: the
    architecture is shape-exact vs the torchvision layer plan (2048-d pool3);
    real FID weights load via eval.fid.load_inception_checkpoint."""
    params = init_inception_params(jax.random.PRNGKey(0))
    imgs = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    feats = inception_features(params, imgs, batch=2)
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()
