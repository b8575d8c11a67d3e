"""Candidate-axis sharding: best-of-N search over an 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from itsd_tpu.core import linear_schedule, sample
from itsd_tpu.parallel import candidate_sharding, make_mesh
from itsd_tpu.search import random_search, zero_order_search

SCHED = linear_schedule(1e-4, 0.02, 8)


def _denoise(noise, key):
    return sample(SCHED, lambda x, t: 0.1 * x, noise, key)


def _verifier(images):
    return -jnp.mean(images ** 2)


def test_random_search_sharded_matches_unsharded(key):
    assert jax.device_count() >= 8
    mesh = make_mesh(axis_names=("data",))
    sh = candidate_sharding(mesh)
    shape = (1, 8, 8, 3)  # B=1 so N*B=8 divides the mesh
    res_plain = random_search(key, shape, _denoise, _verifier,
                              n_candidates=8)
    res_shard = random_search(key, shape, _denoise, _verifier,
                              n_candidates=8, sharding=sh)
    # identical keys -> identical results regardless of sharding
    np.testing.assert_allclose(np.asarray(res_plain.history["scores"]),
                               np.asarray(res_shard.history["scores"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_plain.best_noise),
                               np.asarray(res_shard.best_noise),
                               rtol=1e-5, atol=1e-6)


def test_zero_order_sharded_runs(key):
    mesh = make_mesh(axis_names=("data",))
    sh = candidate_sharding(mesh)
    init = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
    res = zero_order_search(key, init, _denoise, _verifier, n_neighbors=8,
                            n_iterations=2, sharding=sh)
    assert np.isfinite(float(res.best_score))
    assert res.history["scores"].shape == (2, 8)


def test_path_search_sharded_matches_unsharded(key):
    from itsd_tpu.search import path_search
    mesh = make_mesh(axis_names=("data",))
    sh = candidate_sharding(mesh)
    eps_fn = lambda x, t: 0.1 * x
    kw = dict(n_paths=8, n_active=2, injection_steps=(4,), delta_f=2,
              noise_shape=(1, 8, 8, 3))
    res_plain = path_search(key, SCHED, eps_fn, _verifier, **kw)
    res_shard = path_search(key, SCHED, eps_fn, _verifier, sharding=sh, **kw)
    np.testing.assert_allclose(np.asarray(res_plain.history["final_scores"]),
                               np.asarray(res_shard.history["final_scores"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_plain.best_noise),
                               np.asarray(res_shard.best_noise),
                               rtol=1e-5, atol=1e-6)


def test_pruned_search_sharded_matches_unsharded(key):
    from itsd_tpu.search import pruned_search
    mesh = make_mesh(axis_names=("data",))
    sh = candidate_sharding(mesh)
    eps_fn = lambda x, t: 0.1 * x
    kw = dict(n_candidates=8, prune_schedule=((5, 4), (3, 2)),
              noise_shape=(1, 8, 8, 3))
    res_plain = pruned_search(key, SCHED, eps_fn, _verifier, **kw)
    res_shard = pruned_search(key, SCHED, eps_fn, _verifier, sharding=sh,
                              **kw)
    np.testing.assert_allclose(np.asarray(res_plain.history["final_scores"]),
                               np.asarray(res_shard.history["final_scores"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_plain.best_images),
                               np.asarray(res_shard.best_images),
                               rtol=1e-5, atol=1e-6)


def test_segment_searches_sharded_match_unsharded(key):
    """Fast-sampler segments (make_segment_denoiser) preserve the
    sharded==unsharded contract for both forking searches."""
    from itsd_tpu.core import make_segment_denoiser
    from itsd_tpu.search import path_search, pruned_search
    mesh = make_mesh(axis_names=("data",))
    sh = candidate_sharding(mesh)
    eps_fn = lambda x, t: 0.1 * x
    for sampler in ("ddim", "dpm"):
        seg = make_segment_denoiser(SCHED, eps_fn, sampler, num_steps=4)
        kw = dict(n_paths=8, n_active=2, injection_steps=(4,), delta_f=2,
                  noise_shape=(1, 8, 8, 3), segment=seg)
        a = path_search(key, SCHED, eps_fn, _verifier, **kw)
        b = path_search(key, SCHED, eps_fn, _verifier, sharding=sh, **kw)
        np.testing.assert_allclose(
            np.asarray(a.history["final_scores"]),
            np.asarray(b.history["final_scores"]), rtol=1e-5, atol=1e-6)
        assert a.nfes == b.nfes

        kw = dict(n_candidates=8, prune_schedule=((5, 4), (3, 2)),
                  noise_shape=(1, 8, 8, 3), segment=seg)
        a = pruned_search(key, SCHED, eps_fn, _verifier, **kw)
        b = pruned_search(key, SCHED, eps_fn, _verifier, sharding=sh, **kw)
        np.testing.assert_allclose(
            np.asarray(a.history["final_scores"]),
            np.asarray(b.history["final_scores"]), rtol=1e-5, atol=1e-6)
        assert a.nfes == b.nfes
