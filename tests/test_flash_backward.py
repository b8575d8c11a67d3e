"""Flash attention backward kernels vs XLA autodiff (interpret mode)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from itsd_tpu.kernels.attention import (_attention_flash_bwd,
                                        _attention_flash_stats,
                                        _attention_xla)

B, N, C = 2, 256, 128
SCALE = C ** -0.5


def _inputs(key):
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, N, C))
    k = jax.random.normal(ks[1], (B, N, C))
    v = jax.random.normal(ks[2], (B, N, C))
    do = jax.random.normal(ks[3], (B, N, C))
    return q, k, v, do


def test_forward_stats_match(key):
    q, k, v, _ = _inputs(key)
    o, lse = _attention_flash_stats(q, k, v, SCALE, block_q=128,
                                    block_k=128, interpret=True)
    want = _attention_xla(q, k, v, SCALE)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                               rtol=2e-3, atol=2e-3)
    # lse must equal logsumexp of the true scores
    s = jnp.einsum("bqc,bkc->bqk", q, k,
                   precision=jax.lax.Precision.HIGHEST) * SCALE
    want_lse = jax.nn.logsumexp(s, axis=-1)[..., None]
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_backward_matches_xla_grads(key):
    q, k, v, do = _inputs(key)
    o, lse = _attention_flash_stats(q, k, v, SCALE, block_q=128,
                                    block_k=128, interpret=True)
    dq, dk, dv = _attention_flash_bwd(q, k, v, o, lse, do, SCALE,
                                      block_q=128, block_k=128,
                                      interpret=True)
    _, vjp = jax.vjp(lambda q, k, v: _attention_xla(q, k, v, SCALE),
                     q, k, v)
    wq, wk, wv = vjp(do)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(wq),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(wk),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(wv),
                               rtol=5e-3, atol=5e-3)
