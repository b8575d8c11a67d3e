"""smc_search: Feynman-Kac steering over the denoising trajectory.

The contract under test: particles carry difference-potential log-weights
on the x0-hat verifier score, systematic resampling fires only when the
effective sample size drops below the threshold, lambda interpolates from
untilted sampling (no resampling ever fires at lambda=0, since weights stay
uniform) to selection pressure, and the program composes with candidate
sharding and the fast-sampler segments exactly like pruned/path search.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.core import linear_schedule, make_segment_denoiser
from itsd_tpu.parallel import candidate_sharding, make_mesh
from itsd_tpu.search import smc_search, smc_search_nfes
from itsd_tpu.search.algorithms import _systematic_resample

T = 10
SCHED = linear_schedule(1e-4, 0.02, T)
EPS = lambda x, t: 0.1 * x
SHAPE = (1, 8, 8, 3)


def _verifier(images):
    # favor bright images: selection pressure with a clean ordering
    return jnp.mean(images)


def test_systematic_resample_is_proportional():
    # one particle holds ~all the weight -> every slot picks it
    log_w = jnp.array([-1e9, -1e9, 50.0, -1e9])
    idx = _systematic_resample(jax.random.PRNGKey(0), log_w)
    np.testing.assert_array_equal(np.asarray(idx), [2, 2, 2, 2])
    # uniform weights -> systematic resampling is the identity permutation
    # (each particle gets exactly one slot)
    idx_u = _systematic_resample(jax.random.PRNGKey(1), jnp.zeros((8,)))
    np.testing.assert_array_equal(np.sort(np.asarray(idx_u)), np.arange(8))


def test_lambda_zero_never_resamples(key):
    res = smc_search(key, SCHED, EPS, _verifier, SHAPE, n_particles=8,
                     resample_steps=(7, 4), lambda_temp=0.0,
                     ess_threshold=0.99)
    assert not np.asarray(res.history["resampled"]).any()
    assert np.allclose(np.asarray(res.history["ess"]), 8.0)
    assert res.nfes == smc_search_nfes(T, 8, (7, 4))


def test_high_pressure_resamples_and_concentrates(key):
    res = smc_search(key, SCHED, EPS, _verifier, SHAPE, n_particles=8,
                     resample_steps=(7, 4), lambda_temp=200.0,
                     ess_threshold=0.9)
    resampled = np.asarray(res.history["resampled"])
    assert resampled.any(), "lambda=200 on spread scores must trip the ESS gate"
    # selection pressure: the steered population's mean final score beats
    # the untilted (lambda=0, same seed/keys) population's mean
    base = smc_search(key, SCHED, EPS, _verifier, SHAPE, n_particles=8,
                      resample_steps=(7, 4), lambda_temp=0.0,
                      ess_threshold=0.9)
    assert (float(np.mean(np.asarray(res.history["final_scores"])))
            > float(np.mean(np.asarray(base.history["final_scores"]))))


def test_resampled_particles_diverge(key):
    # after a resample duplicates a winner, downstream ancestral noise is
    # drawn per-row, so final samples must not contain exact duplicates
    res = smc_search(key, SCHED, EPS, _verifier, SHAPE, n_particles=4,
                     resample_steps=(7,), lambda_temp=500.0,
                     ess_threshold=0.99, return_images=True)
    assert np.asarray(res.history["resampled"]).any()
    finals = np.asarray(res.best_images)  # [B, H, W, C] of the winner
    assert np.isfinite(finals).all()
    # the full population: re-run returning everything via history
    fs = np.asarray(res.history["final_scores"])
    assert len(np.unique(np.round(fs, 10))) > 1, (
        "duplicated lineages must diverge after resampling")


def test_sharded_matches_unsharded(key):
    assert jax.device_count() >= 8
    mesh = make_mesh(axis_names=("data",))
    sh = candidate_sharding(mesh)
    kw = dict(n_particles=8, resample_steps=(7, 4), lambda_temp=5.0,
              ess_threshold=0.6)
    res_p = smc_search(key, SCHED, EPS, _verifier, SHAPE, **kw)
    res_s = smc_search(key, SCHED, EPS, _verifier, SHAPE, sharding=sh, **kw)
    np.testing.assert_allclose(np.asarray(res_p.history["final_scores"]),
                               np.asarray(res_s.history["final_scores"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_p.best_noise),
                               np.asarray(res_s.best_noise),
                               rtol=1e-5, atol=1e-6)


def test_fast_sampler_segments_and_nfes(key):
    seg = make_segment_denoiser(SCHED, EPS, "dpm", num_steps=5)
    res = smc_search(key, SCHED, EPS, _verifier, SHAPE, n_particles=4,
                     resample_steps=(6,), lambda_temp=5.0, segment=seg)
    assert np.isfinite(float(res.best_score))
    assert res.nfes == smc_search_nfes(T, 4, (6,), seg_cost=seg[1])
    assert res.nfes < smc_search_nfes(T, 4, (6,))  # cheaper than ancestral


def test_nan_scores_get_zero_weight(key):
    def nan_verifier(images):
        # NaN whenever the batch mean is above the median-ish threshold
        m = jnp.mean(images)
        return jnp.where(m > 0, jnp.nan, m)

    res = smc_search(key, SCHED, EPS, nan_verifier, SHAPE, n_particles=8,
                     resample_steps=(7, 4), lambda_temp=10.0,
                     ess_threshold=0.99)
    # weights and ESS stay finite; resampling never selects a NaN particle
    assert np.isfinite(np.asarray(res.history["ess"])).all()


def test_empty_resample_steps_rejected(key):
    with pytest.raises(ValueError, match="resample"):
        smc_search(key, SCHED, EPS, _verifier, SHAPE, resample_steps=())


def test_cli_run_search_smc(tmp_path):
    from itsd_tpu.cli.runner import build_model, run_search
    from itsd_tpu.utils.config import load_config
    cfg = load_config(None, [
        "data.dataset=synthetic", "data.img_size=8", "model.channel=8",
        "model.channel_mult=[1]", "model.attn=[]", "model.num_res_blocks=1",
        "diffusion.T=8", "search.algorithm=smc", "search.n_candidates=8",
        "search.smc_resample_steps=[5,3]", "search.smc_lambda=5.0",
        "search.verifier=self_supervised", "train.eval_batch_size=2",
        f"sampled_dir={tmp_path}",
    ])
    model, _ = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 8, 8, 3)), jnp.zeros((1,), jnp.int32))
    out = run_search(cfg, params=params)
    r = out["result"]
    assert np.isfinite(float(r.best_score))
    assert r.nfes == smc_search_nfes(8, 8, (5, 3))
    assert len(r.history["resample_scores"]) == 2
    assert r.history["ess"].shape == (2,)


def test_cli_run_search_smc_dpm_segments(tmp_path):
    from itsd_tpu.cli.runner import build_model, run_search
    from itsd_tpu.utils.config import load_config
    cfg = load_config(None, [
        "data.dataset=synthetic", "data.img_size=8", "model.channel=8",
        "model.channel_mult=[1]", "model.attn=[]", "model.num_res_blocks=1",
        "diffusion.T=8", "diffusion.sampler=dpm", "diffusion.ddim_steps=4",
        "search.algorithm=smc", "search.n_candidates=4",
        "search.smc_resample_steps=[4]",
        "search.verifier=self_supervised", "train.eval_batch_size=2",
        f"sampled_dir={tmp_path}",
    ])
    model, _ = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 8, 8, 3)), jnp.zeros((1,), jnp.int32))
    out = run_search(cfg, params=params)
    assert np.isfinite(float(out["result"].best_score))
    # fast segments: NFE must reflect actual model evals, not ancestral T
    assert out["result"].nfes < smc_search_nfes(8, 4, (4,))


def test_spread_mode_is_verifier_scale_free(key):
    # the measured failure of absolute temperatures (smc_budget.json:
    # ESS->1 at lambda>=2 on ~40-nat classifier scores): in spread mode
    # the increments are z-scored, so scaling the verifier by 1000x must
    # not change a single resampling decision or the final population
    kw = dict(n_particles=8, resample_steps=(7, 4), lambda_temp=1.5,
              ess_threshold=0.7, lambda_scale="spread")
    a = smc_search(key, SCHED, EPS, _verifier, SHAPE, **kw)
    b = smc_search(key, SCHED, EPS, lambda im: 1000.0 * _verifier(im),
                   SHAPE, **kw)
    np.testing.assert_array_equal(np.asarray(a.history["resampled"]),
                                  np.asarray(b.history["resampled"]))
    # f32: the x1000 scale perturbs the z-scores in the last few ulps
    np.testing.assert_allclose(np.asarray(a.history["ess"]),
                               np.asarray(b.history["ess"]),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(a.history["final_scores"]),
                               np.asarray(b.history["final_scores"]) / 1000.0,
                               rtol=1e-3)
    # while ABSOLUTE mode at the same lambda flips from never-resampling
    # to always-resampling under the x1000 scale change
    kw_abs = dict(kw, lambda_scale="absolute")
    a_abs = smc_search(key, SCHED, EPS, _verifier, SHAPE, **kw_abs)
    b_abs = smc_search(key, SCHED, EPS, lambda im: 1000.0 * _verifier(im),
                       SHAPE, **kw_abs)
    assert (np.asarray(a_abs.history["resampled"]).tolist()
            != np.asarray(b_abs.history["resampled"]).tolist())


def test_spread_mode_constant_verifier_stays_uniform(key):
    # zero spread -> z-scores are 0/eps = 0 -> weights stay uniform and
    # the ESS gate never fires, at ANY lambda
    res = smc_search(key, SCHED, EPS, lambda im: jnp.asarray(7.0), SHAPE,
                     n_particles=8, resample_steps=(7, 4),
                     lambda_temp=1e6, ess_threshold=0.99,
                     lambda_scale="spread")
    assert not np.asarray(res.history["resampled"]).any()
    assert np.allclose(np.asarray(res.history["ess"]), 8.0)


def test_bad_lambda_scale_rejected(key):
    with pytest.raises(ValueError, match="lambda_scale"):
        smc_search(key, SCHED, EPS, _verifier, SHAPE, n_particles=4,
                   resample_steps=(7,), lambda_scale="bogus")
