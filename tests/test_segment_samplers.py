"""DDIM/DPM segment denoisers (`core.sampling.ddim_segment/dpm_segment`)
and their composition with the forking searches.

Accuracy is checked against the ANALYTIC probability-flow solution for
Gaussian data (same harness as test_dpm_solver.py): for data ~ N(0, s^2 I)
the deterministic map x_T -> x_0 is known in closed form, and the map to
any intermediate state is the same quantile-preserving flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.core import (ddim_sample, ddim_segment, dpm_segment,
                           linear_schedule, make_segment_denoiser)
from itsd_tpu.search import path_search, pruned_search

SCHED = linear_schedule(1e-4, 0.02, 1000)
S = 0.5


def _gaussian_eps_fn(x, t):
    ab = SCHED.alphas_bar[t].reshape(-1, 1, 1, 1)
    v = ab * S**2 + (1.0 - ab)
    return jnp.sqrt(1.0 - ab) * x / v


def _exact_state(x_T, t_state):
    """Analytic PF-ODE map from state T to state t (0 = clean)."""
    ab_T = SCHED.alphas_bar[-1]
    ab_t = 1.0 if t_state == 0 else SCHED.alphas_bar[t_state - 1]
    v_T = ab_T * S**2 + (1.0 - ab_T)
    v_t = ab_t * S**2 + (1.0 - ab_t)
    return x_T * jnp.sqrt(v_t / v_T)


def test_ddim_segment_full_range_matches_analytic(key):
    """Full-range segment lands in the same accuracy class as the
    established ddim_sample (uniform-t DDIM-50 is ~0.09 off the analytic
    flow on this harness — grid choice, not implementation error)."""
    x_T = jax.random.normal(key, (4, 4, 4, 3))
    out = ddim_segment(SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0),
                       t_from=SCHED.T, t_to=0, num_steps=50, eta=0.0)
    ref = ddim_sample(SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0),
                      num_steps=50, eta=0.0, clip_output=False)
    exact = _exact_state(x_T, 0)
    err = float(jnp.abs(out - exact).max())
    err_ref = float(jnp.abs(ref - exact).max())
    assert err < 1.5 * err_ref + 1e-3, (err, err_ref)
    assert err < 0.12, err


def test_ddim_segment_intermediate_state_is_correct(key):
    """Stopping at t=300 lands on the analytic intermediate state (the
    renoise/fork composition depends on segment outputs having the right
    marginal)."""
    x_T = jax.random.normal(key, (4, 4, 4, 3))
    mid = ddim_segment(SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0),
                       t_from=SCHED.T, t_to=300, num_steps=35, eta=0.0)
    err = float(jnp.abs(mid - _exact_state(x_T, 300)).max())
    assert err < 0.05, err


def test_ddim_segment_composition_matches_full_run(key):
    """T->400 then 400->0 with proportional budgets tracks the same ODE as
    one full-range run (both approximate the analytic flow)."""
    x_T = jax.random.normal(key, (4, 4, 4, 3))
    k = jax.random.PRNGKey(0)
    mid = ddim_segment(SCHED, _gaussian_eps_fn, x_T, k,
                       t_from=SCHED.T, t_to=400, num_steps=30, eta=0.0)
    out = ddim_segment(SCHED, _gaussian_eps_fn, mid, k,
                       t_from=400, t_to=0, num_steps=20, eta=0.0)
    err = float(jnp.abs(out - _exact_state(x_T, 0)).max())
    assert err < 0.15, err


def test_dpm_segment_full_range_beats_ddim(key):
    x_T = jax.random.normal(key, (4, 4, 4, 3))
    exact = _exact_state(x_T, 0)
    dpm = dpm_segment(SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0),
                      t_from=SCHED.T, t_to=0, num_steps=10)
    ddim = ddim_segment(SCHED, _gaussian_eps_fn, x_T, jax.random.PRNGKey(0),
                        t_from=SCHED.T, t_to=0, num_steps=10, eta=0.0)
    e_dpm = float(jnp.abs(dpm - exact).max())
    e_ddim = float(jnp.abs(ddim - exact).max())
    assert e_dpm < e_ddim, (e_dpm, e_ddim)
    assert e_dpm < 0.1, e_dpm


def test_dpm_segment_composition(key):
    x_T = jax.random.normal(key, (4, 4, 4, 3))
    k = jax.random.PRNGKey(0)
    mid = dpm_segment(SCHED, _gaussian_eps_fn, x_T, k,
                      t_from=SCHED.T, t_to=300, num_steps=8)
    out = dpm_segment(SCHED, _gaussian_eps_fn, mid, k,
                      t_from=300, t_to=0, num_steps=6)
    err = float(jnp.abs(out - _exact_state(x_T, 0)).max())
    assert err < 0.1, err


def test_segment_denoiser_cost_accounting():
    fn, cost = make_segment_denoiser(SCHED, _gaussian_eps_fn, "ddpm")
    assert cost(1000, 300) == 700
    fn, cost = make_segment_denoiser(SCHED, _gaussian_eps_fn, "ddim",
                                     num_steps=50)
    assert cost(1000, 0) == 50
    assert cost(1000, 500) == 25       # proportional share
    assert cost(10, 8) == 1            # floor at 1, capped by length
    fn, cost = make_segment_denoiser(SCHED, _gaussian_eps_fn, "dpm",
                                     num_steps=20)
    assert cost(500, 0) == 10


def _overflow_eps(x, t):
    bad = jnp.max(jnp.abs(x)) > 1e3
    return jnp.where(bad, jnp.nan, -3.0 * x)


def test_ddim_segment_clip_denoised_bounds_chain(key):
    sched = linear_schedule(1e-4, 0.02, 200)
    x = jax.random.normal(key, (2, 4, 4, 3))
    raw = ddim_segment(sched, _overflow_eps, x, key, t_from=200, t_to=0,
                       num_steps=50, eta=1.0)
    clip = ddim_segment(sched, _overflow_eps, x, key, t_from=200, t_to=0,
                        num_steps=50, eta=1.0, clip_denoised=True)
    assert not np.isfinite(np.asarray(raw)).all()
    assert np.isfinite(np.asarray(clip)).all()


def _mean_verifier(images):
    return jnp.mean(images)


@pytest.mark.parametrize("sampler", ["ddim", "dpm"])
def test_pruned_search_over_fast_segments(key, sampler):
    """Pruned search composed with a fast segment denoiser: finite result,
    and the reported NFE reflects the REAL eval count (an order of
    magnitude below the ancestral accounting)."""
    seg = make_segment_denoiser(SCHED, _gaussian_eps_fn, sampler,
                                num_steps=40)
    r = pruned_search(key, SCHED, _gaussian_eps_fn, _mean_verifier,
                      (2, 4, 4, 3), n_candidates=4,
                      prune_schedule=((500, 2),), segment=seg)
    assert np.isfinite(float(r.best_score))
    assert np.isfinite(np.asarray(r.best_images)).all()
    # ancestral accounting would be ~3 full denoises; fast segments do
    # 4*20 + 4 + 2*20 evals ~ 0.12 full denoises -> rounds to 0
    assert r.nfes <= 1


@pytest.mark.parametrize("sampler", ["ddim", "dpm"])
def test_path_search_over_fast_segments(key, sampler):
    seg = make_segment_denoiser(SCHED, _gaussian_eps_fn, sampler,
                                num_steps=40)
    r = path_search(key, SCHED, _gaussian_eps_fn, _mean_verifier,
                    (2, 4, 4, 3), n_paths=4, n_active=2,
                    injection_steps=(500,), delta_f=50, segment=seg)
    assert np.isfinite(float(r.best_score))
    assert np.isfinite(np.asarray(r.best_images)).all()
    assert r.nfes <= 1


def test_run_search_pruned_dispatches_fast_segments(tmp_path):
    """CLI-level: diffusion.sampler=ddim reaches the pruned segments (the
    run completes at a tiny eval budget that ancestral couldn't hit)."""
    from itsd_tpu.cli.runner import run_search
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.utils import load_config

    ucfg = uncond_unet_config(ch=8, ch_mult=(1,), attn=(), num_res_blocks=1,
                              dropout=0.0, T=64)
    model = UNet(ucfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)),
                        jnp.zeros((2,), jnp.int32))
    out = run_search(load_config(overrides=[
        "model.channel=8", "model.channel_mult=[1]", "model.attn=[]",
        "model.num_res_blocks=1", "model.dropout=0.0", "diffusion.T=64",
        "diffusion.sampler=ddim", "diffusion.ddim_steps=8",
        "data.dataset=synthetic", "data.img_size=8",
        "train.eval_batch_size=2",
        "search.algorithm=pruned", "search.n_candidates=4",
        "search.prune_schedule=[[32,2]]",
        "search.verifier=self_supervised",
        f"sampled_dir={tmp_path}"]), params=params)
    assert np.isfinite(out["best_score"])
    # 4 cands * 4 evals (T->32) + 4 scoring + 2 * 4 evals (32->0): ~24
    # evals = NFE 0 in full-denoise units (ancestral would report 3)
    assert out["result"].nfes <= 1


def test_dpm_segment_short_coarse_grid_regression(key):
    """T=50 path-search shape that crashed pre-fix: uniform-lambda targets
    snap onto t_to itself, and the grid repair must not push the pinned
    endpoints (interior-only repair in `_segment_state_grid`)."""
    sched = linear_schedule(1e-4, 0.02, 50)

    def eps_fn(x, t):
        ab = sched.alphas_bar[t].reshape(-1, 1, 1, 1)
        v = ab * S**2 + (1.0 - ab)
        return jnp.sqrt(1.0 - ab) * x / v

    x = jax.random.normal(key, (2, 4, 4, 3))
    for t_from, t_to, n in [(50, 30, 4), (50, 30, 20), (30, 0, 6),
                            (2, 1, 1), (50, 49, 1)]:
        out = dpm_segment(sched, eps_fn, x, jax.random.PRNGKey(0),
                          t_from=t_from, t_to=t_to, num_steps=n)
        assert jnp.isfinite(out).all(), (t_from, t_to, n)
        out = ddim_segment(sched, eps_fn, x, jax.random.PRNGKey(0),
                           t_from=t_from, t_to=t_to, num_steps=n)
        assert jnp.isfinite(out).all(), (t_from, t_to, n)
