"""Golden-value regression tests: seeded sampling with fixed keys must keep
producing exactly these values (catches silent changes to key-splitting
order, schedule math, or step algebra)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.core import linear_schedule, sample


def test_golden_zero_eps_sampler():
    sched = linear_schedule(1e-4, 0.02, 8)
    x_T = jnp.ones((1, 2, 2, 1))
    out = sample(sched, lambda x, t: jnp.zeros_like(x), x_T,
                 jax.random.PRNGKey(0))
    got = np.asarray(out).ravel()
    # regenerate with: print(repr(got)) — fixed by PRNGKey(0) + key order
    want = np.array([-0.02647325, 0.9374321, 1.0, 1.0], dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_golden_schedule_values():
    s = linear_schedule(1e-4, 0.02, 1000)
    np.testing.assert_allclose(float(s.betas[0]), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s.betas[-1]), 0.02, rtol=1e-6)
    np.testing.assert_allclose(float(s.alphas_bar[-1]), 4.03582e-05,
                               rtol=1e-4)
    np.testing.assert_allclose(float(s.coeff2[-1]), 0.02020346,
                               rtol=1e-4)
    # sampler_var[0] = posterior_var[1] = beta_1*(1-abar_0)/(1-abar_1)
    np.testing.assert_allclose(float(s.sampler_var[0]), 5.45319e-05,
                               rtol=1e-4)


@pytest.mark.slow
def test_async_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer)
    from itsd_tpu.train.checkpoint import (AsyncCheckpointManager,
                                           restore_checkpoint)

    params = {"params": {"w": jnp.arange(4.0)}}
    tx = make_optimizer(OptimizerConfig())
    state = create_train_state(params, tx)
    mgr = AsyncCheckpointManager()
    path = str(tmp_path / "async_ckpt")
    mgr.save(path, state)
    mgr.wait()
    restored = restore_checkpoint(path, state)
    np.testing.assert_array_equal(np.asarray(restored.params["params"]["w"]),
                                  np.arange(4.0))
    mgr.close()
