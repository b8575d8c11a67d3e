"""Inception-V3 topology: production shapes, determinism, preprocessing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.metrics.inception import (IMAGENET_MEAN, IMAGENET_STD,
                                        inception_v3, init_random_params,
                                        preprocess,
                                        _inception_conv_specs)


@pytest.fixture(scope="module")
def params():
    return init_random_params(jax.random.PRNGKey(0))


def test_forward_shapes(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 299, 299, 3)) * 0.5
    feats, logits = inception_v3(params, x)
    assert feats.shape == (2, 2048)
    assert logits.shape == (2, 1000)
    assert np.isfinite(np.asarray(feats)).all()
    assert np.isfinite(np.asarray(logits)).all()


def test_spatial_pipeline_resolutions(params):
    """The canonical InceptionV3 spatial trace: 299 -> 8x8 before pooling.
    Verified indirectly: features differ for inputs differing only in a
    local patch (receptive field sanity)."""
    x = jnp.zeros((1, 299, 299, 3))
    f0, _ = inception_v3(params, x)
    x2 = x.at[0, 140:160, 140:160].set(1.0)
    f1, _ = inception_v3(params, x2)
    assert float(jnp.abs(f0 - f1).max()) > 0


def test_jit_and_determinism(params):
    f = jax.jit(lambda p, x: inception_v3(p, x)[0])
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 299, 299, 3))
    a = f(params, x)
    b = f(params, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preprocess_matches_reference_semantics():
    """Bilinear resize to 299 + ImageNet normalise (`metrics.py:61-87`)."""
    imgs = jnp.ones((1, 32, 32, 3)) * 0.5
    out = preprocess(imgs)
    assert out.shape == (1, 299, 299, 3)
    want = (0.5 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), want, rtol=1e-5)


def test_conv_spec_channel_arithmetic():
    """Every Mixed block's input channels must equal the previous block's
    concatenated output — the assert inside the spec builder enforces the
    final 2048; here we spot-check the known torchvision channel ladder."""
    specs = _inception_conv_specs()
    assert specs["Mixed_5b.branch1x1"][2] == 192
    assert specs["Mixed_5c.branch1x1"][2] == 256
    assert specs["Mixed_5d.branch1x1"][2] == 288
    assert specs["Mixed_6a.branch3x3"][2] == 288
    assert specs["Mixed_6b.branch1x1"][2] == 768
    assert specs["Mixed_7a.branch3x3_1"][2] == 768
    assert specs["Mixed_7b.branch1x1"][2] == 1280
    assert specs["Mixed_7c.branch1x1"][2] == 2048


def test_converter_shape_contract():
    """The torchvision state-dict converter must produce exactly the shapes
    the forward pass consumes: build a fake torch-layout state dict from the
    spec table (OIHW) and run the converted params end-to-end."""
    from itsd_tpu.metrics.inception import convert_torchvision_state_dict
    rng = np.random.default_rng(0)
    sd = {}
    for path, (kh, kw, cin, cout) in _inception_conv_specs().items():
        sd[f"{path}.conv.weight"] = rng.normal(
            size=(cout, cin, kh, kw)).astype(np.float32) * 0.05
        for suffix, val in [("weight", np.ones(cout)),
                            ("bias", np.zeros(cout)),
                            ("running_mean", np.zeros(cout)),
                            ("running_var", np.ones(cout))]:
            sd[f"{path}.bn.{suffix}"] = val.astype(np.float32)
    sd["fc.weight"] = rng.normal(size=(1000, 2048)).astype(np.float32) * 0.01
    sd["fc.bias"] = np.zeros(1000, dtype=np.float32)

    params = convert_torchvision_state_dict(sd)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 299, 299, 3)) * 0.1
    feats, logits = inception_v3(params, x)
    assert feats.shape == (1, 2048) and logits.shape == (1, 1000)
    assert np.isfinite(np.asarray(feats)).all()
