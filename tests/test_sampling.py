"""Sampler: golden equivalence to a hand-rolled loop, segment/renoise
consistency, snapshot sampler, and statistical correctness with an oracle
eps-model."""

import jax
import jax.numpy as jnp
import numpy as np

from itsd_tpu.core import (
    denoise_segment, linear_schedule, p_sample_step, renoise, sample,
    sample_with_snapshots,
)

SCHED = linear_schedule(1e-4, 0.02, 16)


def _zero_eps(x, t):
    return jnp.zeros_like(x)


def _python_loop_sample(sched, eps_fn, x_T, key):
    """Reference-style Python loop (mirrors `Diffusion/Diffusion.py:84-102`),
    using the same key-splitting order as the scan implementation."""
    x = x_T
    for t in range(sched.T - 1, -1, -1):
        key, nkey = jax.random.split(key)
        tb = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        eps = eps_fn(x, tb)
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        x = p_sample_step(sched, x, tb, eps, noise)
    return jnp.clip(x, -1, 1)


def test_scan_sampler_matches_python_loop(key):
    x_T = jax.random.normal(jax.random.PRNGKey(42), (2, 4, 4, 3))

    def eps_fn(x, t):
        return 0.1 * x  # arbitrary deterministic model

    got = sample(SCHED, eps_fn, x_T, key)
    want = _python_loop_sample(SCHED, eps_fn, x_T, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_sampler_is_jittable_and_deterministic(key):
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 3))
    f = jax.jit(lambda x, k: sample(SCHED, _zero_eps, x, k))
    a = f(x_T, key)
    b = f(x_T, key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.abs(a).max()) <= 1.0  # clipped


def test_segment_composition_equals_full(key):
    """Denoising T->8 then 8->0 with the right keys equals one full run."""
    x_T = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 3))

    def eps_fn(x, t):
        return 0.05 * x

    full = sample(SCHED, eps_fn, x_T, key, clip_output=False)

    # Reproduce the same per-step noise keys by splitting manually.
    k = key
    mid = x_T
    # first segment: steps 15..8
    mid = denoise_segment(SCHED, eps_fn, mid, k, t_from=16, t_to=8)
    # advance the key by 8 splits to mirror what the first segment consumed
    for _ in range(8):
        k, _ = jax.random.split(k)
    out = denoise_segment(SCHED, eps_fn, mid, k, t_from=8, t_to=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


def test_renoise_statistics(key):
    """renoise must land on the correct forward marginal."""
    n = 4000
    x0 = jnp.full((n, 2, 2, 1), 0.7)
    t_target = 12
    out = renoise(SCHED, x0, 0, t_target, key)
    ab = float(SCHED.alphas_bar[t_target - 1])
    assert abs(float(out.mean()) - 0.7 * np.sqrt(ab)) < 2e-2
    assert abs(float(out.std()) - np.sqrt(1 - ab)) < 2e-2


def test_renoise_then_segment_shapes(key):
    x_T = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 4, 3))
    mid = denoise_segment(SCHED, _zero_eps, x_T, key, t_from=16, t_to=6)
    back = renoise(SCHED, mid, 6, 12, jax.random.PRNGKey(6))
    out = denoise_segment(SCHED, _zero_eps, back, jax.random.PRNGKey(7),
                          t_from=12, t_to=0, clip_output=True)
    assert out.shape == x_T.shape
    assert float(jnp.abs(out).max()) <= 1.0


def test_snapshots(key):
    x_T = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 4, 3))
    x0, ts, snaps = sample_with_snapshots(SCHED, _zero_eps, x_T, key,
                                          interval=4)
    assert list(np.asarray(ts)) == [12, 8, 4, 0]
    assert snaps.shape == (4, 2, 4, 4, 3)
    # final snapshot (t=0, unclipped) must clip to x0
    np.testing.assert_allclose(np.asarray(jnp.clip(snaps[-1], -1, 1)),
                               np.asarray(x0), rtol=1e-6)


def test_snapshots_with_remainder(key):
    x_T = jax.random.normal(jax.random.PRNGKey(9), (1, 2, 2, 1))
    x0, ts, snaps = sample_with_snapshots(SCHED, _zero_eps, x_T, key,
                                          interval=5)
    assert list(np.asarray(ts)) == [11, 6, 1, 0]
    assert snaps.shape[0] == 4


def test_oracle_model_denoises_to_data(key):
    """With the *true* eps for a known x0, sampling should land near x0:
    an end-to-end statistical check of the whole reverse chain."""
    sched = linear_schedule(1e-4, 0.02, 200)
    x0_true = jnp.zeros((64, 2, 2, 1)) + 0.3

    def oracle_eps(x, t):
        # eps consistent with x being q_sample(x0_true, t):
        # eps = (x - sqrt(ab) x0) / sqrt(1 - ab)
        ab = sched.alphas_bar[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(ab) * x0_true) / jnp.sqrt(1 - ab)

    x_T = jax.random.normal(key, x0_true.shape)
    out = sample(sched, oracle_eps, x_T, jax.random.PRNGKey(10))
    # mean over the batch should approach 0.3 (per-sample noise remains)
    assert abs(float(out.mean()) - 0.3) < 0.05
