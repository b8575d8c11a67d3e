"""DPM-Solver++(2M): determinism, oracle convergence, and — the point of a
second-order method — strictly better ODE accuracy than DDIM at equal NFE,
checked against the *analytic* probability-flow solution for Gaussian data.

For data ~ N(0, s^2 I) the exact eps-predictor is linear in x and the PF ODE
is quantile-preserving, so the deterministic map from x_T to x_0 is known in
closed form: x_0 = x_T * s / sqrt(abar_T * s^2 + (1 - abar_T)). Both DDIM
(eta=0) and DPM-Solver++ discretise that same ODE; the solver's O(h^3) local
error must land far closer at the same step count.
"""

import jax
import jax.numpy as jnp
import numpy as np

from itsd_tpu.core import ddim_sample, dpm_solver_sample, linear_schedule

SCHED = linear_schedule(1e-4, 0.02, 1000)
S = 0.5  # data std


def _gaussian_eps_fn(x, t):
    ab = SCHED.alphas_bar[t].reshape(-1, 1, 1, 1)
    v = ab * S**2 + (1.0 - ab)           # marginal variance at state t
    return jnp.sqrt(1.0 - ab) * x / v


def _exact_x0(x_T):
    ab_T = SCHED.alphas_bar[-1]
    return x_T * S / jnp.sqrt(ab_T * S**2 + (1.0 - ab_T))


def test_dpm_deterministic_and_key_independent(key):
    x_T = jax.random.normal(key, (2, 4, 4, 3))
    a = dpm_solver_sample(SCHED, _gaussian_eps_fn, x_T,
                          jax.random.PRNGKey(1), num_steps=10)
    b = dpm_solver_sample(SCHED, _gaussian_eps_fn, x_T,
                          jax.random.PRNGKey(2), num_steps=10)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_dpm_beats_ddim_at_equal_nfe(key):
    x_T = jax.random.normal(key, (8, 4, 4, 3))
    exact = _exact_x0(x_T)
    dpm = dpm_solver_sample(SCHED, _gaussian_eps_fn, x_T,
                            jax.random.PRNGKey(0), num_steps=10,
                            clip_output=False)
    ddim = ddim_sample(SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0),
                       num_steps=10, eta=0.0, clip_output=False)
    err_dpm = float(jnp.abs(dpm - exact).max())
    err_ddim = float(jnp.abs(ddim - exact).max())
    # second order: at 10 steps the solver must be several times closer
    assert err_dpm < 0.5 * err_ddim, (err_dpm, err_ddim)
    assert err_dpm < 0.1, err_dpm


def test_dpm_converges_with_steps(key):
    x_T = jax.random.normal(key, (4, 2, 2, 1))
    exact = _exact_x0(x_T)
    errs = []
    for n in (5, 10, 20):
        out = dpm_solver_sample(SCHED, _gaussian_eps_fn, x_T,
                                jax.random.PRNGKey(0), num_steps=n,
                                clip_output=False)
        errs.append(float(jnp.abs(out - exact).max()))
    assert errs[0] > errs[1] > errs[2], errs
    assert errs[2] < 0.03, errs


def test_dpm_jits_and_clips(key):
    x_T = jax.random.normal(key, (1, 4, 4, 3)) * 3.0
    f = jax.jit(lambda x, k: dpm_solver_sample(
        SCHED, _gaussian_eps_fn, x, k, num_steps=5))
    out = f(x_T, jax.random.PRNGKey(0))
    assert out.shape == x_T.shape
    assert float(jnp.abs(out).max()) <= 1.0


def test_run_sampler_dispatches_dpm(tmp_path):
    from itsd_tpu.cli.runner import run_sampler
    from itsd_tpu.utils import Config, apply_overrides
    cfg = Config()
    apply_overrides(cfg, ["diffusion.sampler=dpm", "diffusion.T=50",
                          "diffusion.ddim_steps=8"])
    sched = linear_schedule(cfg.diffusion.beta_1, cfg.diffusion.beta_T,
                            cfg.diffusion.T)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    out = run_sampler(cfg, sched, lambda x, t: 0.1 * x, x_T,
                      jax.random.PRNGKey(1))
    assert out.shape == x_T.shape
    assert np.isfinite(np.asarray(out)).all()
