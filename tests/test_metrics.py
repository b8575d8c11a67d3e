"""FID math vs scipy and closed forms; Inception Score protocol."""

import numpy as np
import pytest

from itsd_tpu.metrics import (compute_fid, frechet_distance,
                              frechet_distance_jax, gaussian_stats,
                              inception_score_from_probs, is_score_jax)


def test_frechet_identical_distributions_is_zero():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=8)
    a = rng.normal(size=(8, 8))
    sigma = a @ a.T + np.eye(8)
    assert frechet_distance(mu, sigma, mu, sigma) < 1e-6


def test_frechet_mean_shift_closed_form():
    """For equal covariances, FID = |mu1 - mu2|^2."""
    rng = np.random.default_rng(1)
    a = rng.normal(size=(6, 6))
    sigma = a @ a.T + np.eye(6)
    mu1 = np.zeros(6)
    mu2 = np.full(6, 2.0)
    want = float(np.sum((mu1 - mu2) ** 2))
    got = frechet_distance(mu1, sigma, mu2, sigma)
    assert abs(got - want) < 1e-3 * want


def test_frechet_diagonal_closed_form():
    """Diagonal Gaussians: FID = sum (s1 + s2 - 2 sqrt(s1 s2))."""
    s1 = np.diag([1.0, 4.0, 9.0])
    s2 = np.diag([1.0, 1.0, 1.0])
    mu = np.zeros(3)
    want = sum(a + b - 2 * np.sqrt(a * b)
               for a, b in [(1, 1), (4, 1), (9, 1)])
    got = frechet_distance(mu, s1, mu, s2, eps=0.0)
    assert abs(got - want) < 1e-6


def test_frechet_matches_scipy_sqrtm():
    """Ground-truth cross-check against scipy's general matrix sqrt — the
    reference's primary path (`utils/metrics.py:219`)."""
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.default_rng(2)
    a = rng.normal(size=(16, 16))
    b = rng.normal(size=(16, 16))
    s1 = a @ a.T + 0.5 * np.eye(16)
    s2 = b @ b.T + 0.5 * np.eye(16)
    mu1 = rng.normal(size=16)
    mu2 = rng.normal(size=16)
    covmean = scipy_linalg.sqrtm(s1 @ s2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    want = (np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2)
            - 2 * np.trace(covmean))
    got = frechet_distance(mu1, s1, mu2, s2, eps=0.0)
    assert abs(got - want) < 1e-6 * abs(want)


def test_frechet_jax_orders_like_numpy():
    rng = np.random.default_rng(3)
    feats_r = rng.normal(size=(512, 8)).astype(np.float32)
    feats_a = rng.normal(size=(512, 8)).astype(np.float32) + 0.5
    feats_b = rng.normal(size=(512, 8)).astype(np.float32) + 2.0
    import jax.numpy as jnp
    mu_r, s_r = gaussian_stats(feats_r)
    mu_a, s_a = gaussian_stats(feats_a)
    mu_b, s_b = gaussian_stats(feats_b)
    j = lambda *a: [jnp.asarray(x, jnp.float32) for x in a]
    fa = float(frechet_distance_jax(*j(mu_r, s_r, mu_a, s_a)))
    fb = float(frechet_distance_jax(*j(mu_r, s_r, mu_b, s_b)))
    na = frechet_distance(mu_r, s_r, mu_a, s_a)
    nb = frechet_distance(mu_r, s_r, mu_b, s_b)
    assert fa < fb and na < nb
    assert abs(fa - na) / max(na, 1e-6) < 0.05


def test_compute_fid_sample_statistics():
    rng = np.random.default_rng(4)
    real = rng.normal(size=(2000, 4))
    fake_same = rng.normal(size=(2000, 4))
    fake_far = rng.normal(size=(2000, 4)) + 3.0
    assert compute_fid(real, fake_same) < 0.1
    assert compute_fid(real, fake_far) > 30.0


def test_inception_score_protocol():
    # perfectly confident and diverse classifier => IS = num_classes
    n, c = 1000, 10
    probs = np.eye(c)[np.arange(n) % c]
    mean, std = inception_score_from_probs(probs, splits=10)
    assert abs(mean - c) < 1e-6
    assert std < 1e-6
    # uniform probs => IS = 1
    mean_u, _ = inception_score_from_probs(np.full((n, c), 1.0 / c))
    assert abs(mean_u - 1.0) < 1e-6
    # jax single-split agrees
    import jax.numpy as jnp
    assert abs(float(is_score_jax(jnp.asarray(probs))) - c) < 1e-4
