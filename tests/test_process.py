"""q-sample statistics, loss reductions, CFG mixing algebra, x0 prediction."""

import jax
import jax.numpy as jnp
import numpy as np

from itsd_tpu.core import (
    cfg_combine, diffusion_train_terms, extract, linear_schedule,
    loss_reduce, make_cfg_eps_fn, mse_elementwise, predict_x0_from_eps,
    q_sample,
)

SCHED = linear_schedule(1e-4, 0.02, 50)


def test_extract_broadcast_shape():
    v = jnp.arange(50, dtype=jnp.float32)
    t = jnp.array([0, 7, 49])
    out = extract(v, t, 4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0, 7, 49])


def test_q_sample_marginal_statistics(key):
    """x_t | x_0 must have mean sqrt(ab_t) x_0 and var (1 - ab_t)."""
    n = 20000
    x0 = jnp.full((n, 2, 2, 1), 0.5)
    t = jnp.full((n,), 30, dtype=jnp.int32)
    noise = jax.random.normal(key, x0.shape)
    xt = q_sample(SCHED, x0, t, noise)
    ab = float(SCHED.alphas_bar[30])
    assert abs(float(xt.mean()) - 0.5 * np.sqrt(ab)) < 5e-3
    assert abs(float(xt.std()) - np.sqrt(1 - ab)) < 5e-3


def test_train_terms_uniform_t(key):
    t, noise, x_t = diffusion_train_terms(SCHED, key, jnp.zeros((4096, 2, 2, 1)))
    assert t.shape == (4096,)
    assert int(t.min()) >= 0 and int(t.max()) < SCHED.T
    # roughly uniform: mean near (T-1)/2
    assert abs(float(t.mean()) - (SCHED.T - 1) / 2) < 2.5
    assert x_t.shape == noise.shape == (4096, 2, 2, 1)


def test_loss_reductions():
    loss = jnp.ones((4, 3, 2, 2))
    assert float(loss_reduce(loss, "mean")) == 1.0
    # sum/b^2 quirk from the CFG loop (TrainCondition.py:89)
    assert float(loss_reduce(loss, "sum_div_b2")) == 48.0 / 16.0
    np.testing.assert_allclose(
        np.asarray(mse_elementwise(jnp.array([2.0]), jnp.array([0.5]))),
        [2.25])


def test_cfg_combine_algebra():
    e_c = jnp.array([1.0, 2.0])
    e_u = jnp.array([0.5, 1.0])
    np.testing.assert_allclose(np.asarray(cfg_combine(e_c, e_u, 0.0)),
                               np.asarray(e_c))
    np.testing.assert_allclose(np.asarray(cfg_combine(e_c, e_u, 1.8)),
                               2.8 * np.asarray(e_c) - 1.8 * np.asarray(e_u),
                               rtol=1e-6)


def test_make_cfg_eps_fn_dual_batch_equals_two_calls(key):
    """The dual-batched CFG forward must equal the reference's two sequential
    calls (`DiffusionCondition.py:83-85`)."""
    W = jax.random.normal(key, (3, 3))

    def model(x, t, labels):
        # toy conditional model: labels shift the prediction
        return x @ W + labels[:, None, None, None].astype(jnp.float32)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2, 3))
    t = jnp.zeros((4,), jnp.int32)
    labels = jnp.array([1, 2, 3, 4])
    w = 1.8
    eps_fn = make_cfg_eps_fn(model, labels, w)
    got = eps_fn(x, t)
    want = cfg_combine(model(x, t, labels),
                       model(x, t, jnp.zeros_like(labels)), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_make_cfg_eps_fn_folded_candidate_axis(key):
    """Search folds candidates into the batch (N*B rows); labels stay [B].
    Regression: found driving the conditional ImageNet-64 search workload —
    the CFG closure broadcast labels [B] against x [N*B] and crashed."""
    W = jax.random.normal(key, (3, 3))

    def model(x, t, labels):
        return x @ W + labels[:, None, None, None].astype(jnp.float32)

    B, N = 2, 3
    labels = jnp.array([5, 9])
    x = jax.random.normal(jax.random.PRNGKey(1), (N * B, 2, 2, 3))
    t = jnp.zeros((N * B,), jnp.int32)
    eps_fn = make_cfg_eps_fn(model, labels, 1.8)
    got = eps_fn(x, t)
    tiled = jnp.tile(labels, N)
    want = cfg_combine(model(x, t, tiled),
                       model(x, t, jnp.zeros_like(tiled)), 1.8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_predict_x0_roundtrip(key):
    """q_sample then predict_x0_from_eps with the true noise recovers x_0."""
    x0 = jax.random.normal(key, (8, 4, 4, 3))
    t = jnp.array([0, 5, 10, 20, 30, 40, 45, 49])
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    xt = q_sample(SCHED, x0, t, noise)
    x0_hat = predict_x0_from_eps(SCHED, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0),
                               rtol=1e-3, atol=1e-3)


def test_cfg_interval_guides_only_inside(key):
    """Interval-restricted CFG (Kynkaanniemi et al. 2024): inside
    [lo, hi) the step equals the full dual-batched mix; outside it equals
    ONE conditional forward (the w->0 limit); (0, T) is plain CFG."""
    W = jax.random.normal(key, (3, 3))

    def model(x, t, labels):
        return x @ W + labels[:, None, None, None].astype(jnp.float32)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2, 3))
    labels = jnp.array([1, 2, 3, 4])
    w = 1.8
    plain = make_cfg_eps_fn(model, labels, w)
    gated = make_cfg_eps_fn(model, labels, w, interval=(100, 700))
    full = make_cfg_eps_fn(model, labels, w, interval=(0, 1000))
    for tv in (100, 400, 699):  # inside
        t = jnp.full((4,), tv, jnp.int32)
        np.testing.assert_allclose(np.asarray(gated(x, t)),
                                   np.asarray(plain(x, t)), rtol=1e-5)
    for tv in (0, 99, 700, 999):  # outside -> conditional forward only
        t = jnp.full((4,), tv, jnp.int32)
        np.testing.assert_allclose(np.asarray(gated(x, t)),
                                   np.asarray(model(x, t, labels)),
                                   rtol=1e-5)
    for tv in (0, 500, 999):
        t = jnp.full((4,), tv, jnp.int32)
        np.testing.assert_allclose(np.asarray(full(x, t)),
                                   np.asarray(plain(x, t)), rtol=1e-5)


def test_cfg_interval_samples_under_scan(key):
    """The lax.cond gate must trace inside the jitted lax.scan sampler
    (traced batch-constant t) and produce finite samples."""
    from itsd_tpu.core import linear_schedule, sample

    W = 0.05 * jax.random.normal(key, (3, 3))

    def model(x, t, labels):
        return x @ W + 0.01 * labels[:, None, None, None].astype(jnp.float32)

    sched = linear_schedule(1e-4, 0.02, 10)
    eps_fn = make_cfg_eps_fn(model, jnp.array([1, 2]), 1.8, interval=(3, 8))
    x_T = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 2, 3))
    out = jax.jit(lambda k: sample(sched, eps_fn, x_T, k))(
        jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_interval_traced_scalars_one_program(key):
    """w/lo/hi may ride as TRACED scalars (an arm sweep shares one compiled
    program): results must match the static-constant path exactly, and
    distinct (w, lo, hi) values must NOT retrigger compilation."""
    W = jax.random.normal(key, (3, 3))

    def model(x, t, labels):
        return x @ W + labels[:, None, None, None].astype(jnp.float32)

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2, 3))
    labels = jnp.array([1, 2, 3, 4])

    compiles = 0

    @jax.jit
    def traced(xx, t, w, lo, hi):
        nonlocal compiles
        compiles += 1
        return make_cfg_eps_fn(model, labels, w, interval=(lo, hi))(xx, t)

    for w, lo, hi in [(1.8, 100, 700), (0.5, 0, 1000), (0.0, 0, 0)]:
        static = make_cfg_eps_fn(model, labels, w, interval=(lo, hi))
        for tv in (0, 99, 100, 699, 700, 999):
            t = jnp.full((4,), tv, jnp.int32)
            np.testing.assert_allclose(np.asarray(traced(x, t, w, lo, hi)),
                                       np.asarray(static(x, t)), rtol=1e-5)
    assert compiles == 1, f"traced scalars retraced {compiles}x"


def test_cfg_nfes_accounting():
    from itsd_tpu.core import cfg_nfes
    assert cfg_nfes(1000) == 2000
    assert cfg_nfes(1000, (0, 1000)) == 2000
    assert cfg_nfes(1000, (200, 800)) == 1600
    assert cfg_nfes(1000, (800, 3000)) == 1200  # clamped to [0, T)
    assert cfg_nfes(1000, (500, 500)) == 1000   # empty interval = no CFG
