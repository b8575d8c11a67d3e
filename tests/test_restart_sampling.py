"""Restart sampling (`core.sampling.restart_sample`) — the third
inference-time scaling axis (Xu et al. 2023, arXiv:2306.14878): re-noise
+ re-denoise configured intervals, riding any base sampler family.

Correctness leans on the analytic Gaussian harness shared with
test_dpm_solver.py / test_segment_samplers.py: for data ~ N(0, s^2 I)
the exact eps-model is known, so a correct restart chain must PRESERVE
the clean-data marginal no matter how many bounces it takes (each
renoise draws from q(x_tmax | x_tmin) and each re-denoise inverts it).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.core import (denoise_segment, linear_schedule,
                           make_segment_denoiser, restart_nfes,
                           restart_sample)
from itsd_tpu.core.sampling import segment_cost

SCHED = linear_schedule(1e-4, 0.02, 1000)
S = 0.5


def _gaussian_eps_fn(x, t):
    ab = SCHED.alphas_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
    v = ab * S**2 + (1.0 - ab)
    return jnp.sqrt(1.0 - ab) * x / v


# ---------------------------------------------------------------------------
# Spec validation


def test_restart_spec_validation():
    nfes = lambda r: restart_nfes(100, r)
    with pytest.raises(ValueError, match="out of range"):
        nfes(((120, 50, 1),))
    with pytest.raises(ValueError, match="out of range"):
        nfes(((50, 50, 1),))
    with pytest.raises(ValueError, match="overlaps"):
        nfes(((80, 40, 1), (60, 20, 1)))
    with pytest.raises(ValueError, match="k=0"):
        nfes(((80, 40, 0),))
    # touching intervals are legal; descending order enforced
    assert nfes(((80, 40, 1), (40, 10, 1))) > 0


# ---------------------------------------------------------------------------
# NFE accounting


def test_restart_nfes_ancestral():
    # base chain costs T; each (t_max, t_min, k) adds k * (t_max - t_min)
    assert restart_nfes(10, ()) == 10
    assert restart_nfes(10, ((8, 4, 2),)) == 10 + 2 * 4
    assert restart_nfes(100, ((80, 40, 1), (30, 10, 3))) == \
        100 + 1 * 40 + 3 * 20


def test_restart_nfes_fast_segments():
    # fast families pay the proportional ddim_steps share per traversal
    cost = segment_cost(100, "ddim", num_steps=10)
    # segments: 100->80 (2), 80->40 (4) x3 traversals, 40->0 (4)
    assert restart_nfes(100, ((80, 40, 2),), seg_cost=cost) == \
        cost(100, 80) + 3 * cost(80, 40) + cost(40, 0)
    # and make_segment_denoiser's cost half is the same function
    _, mcost = make_segment_denoiser(SCHED, _gaussian_eps_fn, "dpm",
                                     num_steps=20)
    assert mcost(1000, 500) == segment_cost(1000, "dpm", 20)(1000, 500)


# ---------------------------------------------------------------------------
# Chain semantics


def test_restartless_is_the_plain_segment_chain(key):
    """restarts=() must degenerate to one full-chain segment (same keys),
    so turning the feature off is bit-exact, not merely equivalent."""
    x_T = jax.random.normal(key, (2, 4, 4, 3))
    out = restart_sample(SCHED, _gaussian_eps_fn, x_T,
                         jax.random.PRNGKey(3), restarts=(),
                         clip_output=False)
    ref = denoise_segment(SCHED, _gaussian_eps_fn, x_T,
                          jax.random.fold_in(jax.random.PRNGKey(3), 1),
                          SCHED.T, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("sampler", ["ddpm", "ddim", "dpm"])
def test_restart_jits_all_families(sampler):
    sched = linear_schedule(1e-4, 0.02, 40)

    def eps(x, t):
        ab = sched.alphas_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
        v = ab * S**2 + (1.0 - ab)
        return jnp.sqrt(1.0 - ab) * x / v

    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    f = jax.jit(lambda x, k: restart_sample(
        sched, eps, x, k, restarts=((30, 10, 2),), sampler=sampler,
        num_steps=8))
    out = f(x_T, jax.random.PRNGKey(1))
    assert out.shape == x_T.shape
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out).max()) <= 1.0  # clip_output default


def test_restart_preserves_the_clean_marginal(key):
    """With the EXACT Gaussian model, bounce cycles must not bias or
    reshape the output distribution: renoise draws q(x_tmax | x_tmin)
    and the re-denoise inverts it, so x_0 stays ~ N(0, s^2) however
    many restarts run. A wrong renoise level or segment endpoint shows
    up directly as variance drift here."""
    x_T = jax.random.normal(key, (512, 2, 2, 1))
    out = restart_sample(SCHED, _gaussian_eps_fn, x_T,
                         jax.random.PRNGKey(5),
                         restarts=((600, 200, 2),), sampler="ddim",
                         num_steps=40, clip_output=False)
    flat = np.asarray(out).ravel()
    assert abs(flat.mean()) < 0.05, flat.mean()
    assert abs(flat.std() - S) < 0.15 * S, flat.std()


# ---------------------------------------------------------------------------
# Product wiring (cli.runner.run_sampler / config)


def _tiny_cfg(**diff_overrides):
    from itsd_tpu.utils.config import Config
    cfg = Config()
    cfg.diffusion.T = 40
    for k, v in diff_overrides.items():
        setattr(cfg.diffusion, k, v)
    return cfg


def test_run_sampler_dispatches_restart():
    from itsd_tpu.cli.runner import run_sampler
    sched = linear_schedule(1e-4, 0.02, 40)

    def eps(x, t):
        ab = sched.alphas_bar[t].reshape((-1,) + (1,) * (x.ndim - 1))
        v = ab * S**2 + (1.0 - ab)
        return jnp.sqrt(1.0 - ab) * x / v

    cfg = _tiny_cfg(restart_intervals=((30, 10, 1),), sampler="dpm",
                    ddim_steps=8)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 3))
    out = run_sampler(cfg, sched, eps, x_T, jax.random.PRNGKey(1))
    assert out.shape == x_T.shape and bool(jnp.isfinite(out).all())


def test_run_sampler_rejects_picard_restarts():
    from itsd_tpu.cli.runner import run_sampler
    cfg = _tiny_cfg(restart_intervals=((30, 10, 1),), sampler="picard")
    sched = linear_schedule(1e-4, 0.02, 40)
    with pytest.raises(ValueError, match="picard"):
        run_sampler(cfg, sched, _gaussian_eps_fn,
                    jnp.zeros((1, 4, 4, 3)), jax.random.PRNGKey(0))


def test_tracked_metrics_disabled_under_restarts():
    from itsd_tpu.cli.runner import resolve_track_metrics
    cfg = _tiny_cfg(restart_intervals=((30, 10, 1),))
    cfg.data.dataset = "shapes"
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert resolve_track_metrics(cfg) is False
    assert any("restart_intervals" in str(x.message) for x in w)
    cfg.diffusion.restart_intervals = ()
    assert resolve_track_metrics(cfg) is True
