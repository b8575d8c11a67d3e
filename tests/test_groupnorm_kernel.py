"""Fused GroupNorm+Swish kernel vs torch-equivalent reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.kernels.groupnorm import (groupnorm_swish,
                                        groupnorm_swish_pallas,
                                        groupnorm_swish_xla)


@pytest.fixture
def data(key):
    x = jax.random.normal(key, (2, 8, 8, 128)) * 2 + 0.5
    scale = jax.random.normal(jax.random.PRNGKey(1), (128,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (128,)) * 0.1
    return x, scale, bias


@pytest.mark.slow
def test_xla_matches_torch_groupnorm(data):
    torch = pytest.importorskip("torch")
    x, scale, bias = data
    got = groupnorm_swish_xla(x, scale, bias, groups=32, act=False)
    tx = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    gn = torch.nn.GroupNorm(32, 128, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.tensor(np.asarray(scale)))
        gn.bias.copy_(torch.tensor(np.asarray(bias)))
        want = gn(tx).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_xla_swish(data):
    x, scale, bias = data
    base = groupnorm_swish_xla(x, scale, bias, 32, act=False)
    act = groupnorm_swish_xla(x, scale, bias, 32, act=True)
    np.testing.assert_allclose(
        np.asarray(act), np.asarray(base * jax.nn.sigmoid(base)),
        rtol=1e-5, atol=1e-6)


def test_pallas_matches_xla_interpret(data):
    x, scale, bias = data
    want = groupnorm_swish_xla(x, scale, bias, 32, act=True)
    got = groupnorm_swish_pallas(x, scale, bias, 32, act=True,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_dispatcher_cpu_falls_back(data):
    x, scale, bias = data
    out = groupnorm_swish(x, scale, bias, 32)  # auto on CPU -> xla
    assert out.shape == x.shape
