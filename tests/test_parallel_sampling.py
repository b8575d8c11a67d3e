"""Parallel-in-time (Picard) sampling: exactness vs sequential DDIM at full
iteration count, early convergence on smooth models, and jit behaviour.

After k Picard sweeps the first k grid points equal the sequential
trajectory exactly, so max_iters = num_steps must reproduce
ddim_sample(eta=0) up to float reassociation of the cumulative sum — that
is the correctness anchor. The speed claim (convergence in far fewer
sweeps than num_steps) is checked on the analytic Gaussian-data model.
"""

import jax
import jax.numpy as jnp
import numpy as np

from itsd_tpu.core import (ddim_sample, linear_schedule,
                           parallel_picard_sample)

SCHED = linear_schedule(1e-4, 0.02, 200)
S = 0.5


def _gaussian_eps_fn(x, t):
    ab = SCHED.alphas_bar[t].reshape(-1, 1, 1, 1)
    v = ab * S**2 + (1.0 - ab)
    return jnp.sqrt(1.0 - ab) * x / v


def test_picard_full_iters_equals_sequential_ddim(key):
    x_T = jax.random.normal(key, (4, 4, 4, 3))
    n = 16
    seq = ddim_sample(SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0),
                      num_steps=n, eta=0.0, clip_output=False)
    par, iters = parallel_picard_sample(
        SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0), num_steps=n,
        max_iters=n, tol=0.0, clip_output=False)
    # tol=0 runs until the sweep is an exact fixed point (or n sweeps —
    # after which the whole grid is exact by induction)
    assert 1 <= int(iters) <= n
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq),
                               atol=2e-4, rtol=1e-4)


def test_picard_converges_in_fewer_sweeps(key):
    """The point of the method: sweeps-to-converge << grid length."""
    x_T = jax.random.normal(key, (4, 4, 4, 3))
    n = 32
    seq = ddim_sample(SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0),
                      num_steps=n, eta=0.0, clip_output=False)
    par, iters = parallel_picard_sample(
        SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0), num_steps=n,
        tol=1e-4, clip_output=False)
    assert int(iters) <= n // 2, int(iters)
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq), atol=5e-3)


def test_run_sampler_dispatches_picard():
    from itsd_tpu.cli.runner import run_sampler
    from itsd_tpu.utils import Config, apply_overrides
    cfg = Config()
    apply_overrides(cfg, ["diffusion.sampler=picard", "diffusion.T=50",
                          "diffusion.ddim_steps=8"])
    sched = linear_schedule(cfg.diffusion.beta_1, cfg.diffusion.beta_T,
                            cfg.diffusion.T)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    out = run_sampler(cfg, sched, lambda x, t: 0.1 * x, x_T,
                      jax.random.PRNGKey(1))
    assert out.shape == x_T.shape
    assert np.isfinite(np.asarray(out)).all()


def test_picard_jits_and_clips(key):
    x_T = jax.random.normal(key, (2, 4, 4, 3)) * 3.0
    f = jax.jit(lambda x, k: parallel_picard_sample(
        SCHED, _gaussian_eps_fn, x, k, num_steps=8))
    out, iters = f(x_T, jax.random.PRNGKey(0))
    assert out.shape == x_T.shape
    assert float(jnp.abs(out).max()) <= 1.0
    assert 1 <= int(iters) <= 8


def test_picard_time_grid_shards_over_mesh(key):
    """The folded time-grid axis shards over the mesh like search
    candidates: sharded and unsharded runs must agree (the point being each
    Picard sweep's model eval splits across chips)."""
    from itsd_tpu.parallel import candidate_sharding, make_mesh

    x_T = jax.random.normal(key, (1, 4, 4, 3))
    n = 8
    plain, it0 = parallel_picard_sample(
        SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0), num_steps=n,
        tol=1e-5, clip_output=False)
    mesh = make_mesh(axis_names=("data",))
    sh = candidate_sharding(mesh)
    shard, it1 = jax.jit(lambda x, k: parallel_picard_sample(
        SCHED, _gaussian_eps_fn, x, k, num_steps=n, tol=1e-5,
        clip_output=False, sharding=sh))(x_T, jax.random.PRNGKey(0))
    assert int(it0) == int(it1)
    np.testing.assert_allclose(np.asarray(shard), np.asarray(plain),
                               atol=1e-5)
