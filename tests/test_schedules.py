"""Schedule math vs closed form and vs the torch reference buffers."""

import numpy as np
import pytest

from itsd_tpu.core import linear_schedule, make_schedule


def test_linear_schedule_closed_form():
    beta_1, beta_T, T = 1e-4, 0.02, 100
    s = linear_schedule(beta_1, beta_T, T)
    betas = np.linspace(beta_1, beta_T, T)
    np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alphas), 1 - betas, rtol=1e-6)
    ab = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(s.alphas_bar), ab, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.sqrt_alphas_bar), np.sqrt(ab),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.coeff1),
                               np.sqrt(1 / (1 - betas)), rtol=1e-6)
    ab_prev = np.concatenate([[1.0], ab[:-1]])
    post = betas * (1 - ab_prev) / (1 - ab)
    np.testing.assert_allclose(np.asarray(s.posterior_var), post, rtol=1e-5)
    # sampler variance: posterior_var[1] at step 0, beta_t elsewhere
    # (the reference concatenates posterior_var[1:2] with betas[1:],
    #  `Diffusion/Diffusion.py:76`)
    np.testing.assert_allclose(np.asarray(s.sampler_var),
                               np.concatenate([post[1:2], betas[1:]]),
                               rtol=1e-5)
    assert s.T == T


def test_schedule_matches_torch_reference_buffers():
    """Numerical parity with the buffers registered by the reference's
    GaussianDiffusionSampler (`/root/reference/Diffusion/Diffusion.py:50-65`),
    recomputed here with torch's own float64 ops."""
    torch = pytest.importorskip("torch")
    beta_1, beta_T, T = 1e-4, 0.02, 1000
    betas = torch.linspace(beta_1, beta_T, T).double()
    alphas = 1.0 - betas
    alphas_bar = torch.cumprod(alphas, dim=0)
    alphas_bar_prev = torch.nn.functional.pad(alphas_bar, [1, 0], value=1)[:T]
    coeff1 = torch.sqrt(1.0 / alphas)
    coeff2 = coeff1 * (1.0 - alphas) / torch.sqrt(1.0 - alphas_bar)
    posterior_var = betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)

    s = linear_schedule(beta_1, beta_T, T)
    np.testing.assert_allclose(np.asarray(s.coeff1),
                               coeff1.float().numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.coeff2),
                               coeff2.float().numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.posterior_var),
                               posterior_var.float().numpy(),
                               rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_bar),
        torch.sqrt(1 - alphas_bar).float().numpy(), rtol=1e-6)


def test_make_schedule_factory():
    s = make_schedule(1e-4, 0.02, 10, kind="linear")
    assert s.T == 10
    with pytest.raises(ValueError):
        make_schedule(1e-4, 0.02, 10, kind="cosine")
