"""DDIM sampler: determinism at eta=0, oracle-model convergence, NFE
reduction, and full-step consistency with ancestral-sampler marginals."""

import jax
import jax.numpy as jnp
import numpy as np

from itsd_tpu.core import ddim_sample, linear_schedule, sample

SCHED = linear_schedule(1e-4, 0.02, 100)


def _oracle_eps(x0_true):
    def eps_fn(x, t):
        ab = SCHED.alphas_bar[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(ab) * x0_true) / jnp.sqrt(1 - ab)
    return eps_fn


def test_ddim_eta0_is_deterministic(key):
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    eps = lambda x, t: 0.1 * x
    a = ddim_sample(SCHED, eps, x_T, jax.random.PRNGKey(2), num_steps=10)
    b = ddim_sample(SCHED, eps, x_T, jax.random.PRNGKey(99), num_steps=10)
    # eta=0: result independent of the RNG key
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_ddim_oracle_converges_with_few_steps(key):
    """With the true eps, DDIM at 10 steps should recover x0 about as well
    as ancestral at 100 steps — the whole point of fewer-NFE sampling."""
    x0_true = jnp.zeros((32, 4, 4, 1)) + 0.4
    eps_fn = _oracle_eps(x0_true)
    x_T = jax.random.normal(key, x0_true.shape)
    out_ddim = ddim_sample(SCHED, eps_fn, x_T, jax.random.PRNGKey(3),
                           num_steps=10)
    assert abs(float(out_ddim.mean()) - 0.4) < 0.05
    out_ddpm = sample(SCHED, eps_fn, x_T, jax.random.PRNGKey(4))
    assert abs(float(out_ddpm.mean()) - 0.4) < 0.05
    # deterministic DDIM has LOWER variance around the target
    assert float(out_ddim.std()) <= float(out_ddpm.std()) + 1e-3


def test_ddim_full_steps_eta1_statistics(key):
    """eta=1 with all T steps behaves like ancestral sampling
    statistically (same marginal family)."""
    x0_true = jnp.zeros((64, 2, 2, 1)) + 0.2
    eps_fn = _oracle_eps(x0_true)
    x_T = jax.random.normal(key, x0_true.shape)
    out = ddim_sample(SCHED, eps_fn, x_T, jax.random.PRNGKey(5),
                      num_steps=100, eta=1.0)
    assert abs(float(out.mean()) - 0.2) < 0.06


def test_ddim_jits_once_for_multiple_keys(key):
    x_T = jax.random.normal(key, (1, 4, 4, 3))
    f = jax.jit(lambda x, k: ddim_sample(
        SCHED, lambda xx, tt: jnp.zeros_like(xx), x, k, num_steps=5))
    a = f(x_T, jax.random.PRNGKey(0))
    assert a.shape == x_T.shape
    assert float(jnp.abs(a).max()) <= 1.0
