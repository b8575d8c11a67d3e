"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.kernels.attention import (_attention_flash, _attention_xla,
                                        mha_attention, spatial_attention)


def test_flash_matches_xla_interpret(key):
    B, N, C = 2, 256, 128
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, N, C))
    k = jax.random.normal(k2, (B, N, C))
    v = jax.random.normal(k3, (B, N, C))
    scale = C ** -0.5
    want = _attention_xla(q, k, v, scale)
    got = _attention_flash(q, k, v, scale, block_q=128, block_k=128,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_spatial_attention_softmax_property(key):
    """Attention with v = ones must return ones (rows sum to 1)."""
    B, N, C = 1, 64, 8
    q = jax.random.normal(key, (B, N, C))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, N, C))
    v = jnp.ones((B, N, C))
    out = spatial_attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.ones((B, N, C)),
                               rtol=1e-5)


@pytest.mark.slow
def test_mha_matches_per_head_single_head(key):
    B, N, H, D = 2, 16, 4, 8
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (B, N, H, D))
    k = jax.random.normal(ks[1], (B, N, H, D))
    v = jax.random.normal(ks[2], (B, N, H, D))
    got = mha_attention(q, k, v, impl="xla")
    from itsd_tpu.kernels.attention import _attention_xla as ax
    for h in range(H):
        want_h = ax(q[:, :, h], k[:, :, h], v[:, :, h], D ** -0.5)
        np.testing.assert_allclose(np.asarray(got[:, :, h]),
                                   np.asarray(want_h), rtol=1e-5, atol=1e-5)
