"""Model zoo: shapes, init properties, conditional semantics, ViT, embeddings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.models import (
    ConditionalEmbedding, FunctionalTimeEmbedding, TableTimeEmbedding,
    UNet, UNetConfig, ViT, ViTConfig, cond_unet_config, sinusoidal_features,
    uncond_unet_config,
)

TINY = uncond_unet_config(ch=32, ch_mult=(1, 2), attn=(1,), num_res_blocks=1,
                          dropout=0.1)
TINY_COND = cond_unet_config(num_labels=10, ch=32, ch_mult=(1, 2),
                             num_res_blocks=1, dropout=0.1, T=16)


def _init(model, *args, **kw):
    return model.init({"params": jax.random.PRNGKey(0)}, *args, **kw)


def test_sinusoidal_matches_torch_reference_layout():
    """Interleaved sin/cos layout must match `Diffusion/Model.py:76-88`."""
    torch = pytest.importorskip("torch")
    import math
    d_model = 16
    t = np.array([0, 1, 5, 999])
    emb = torch.arange(0, d_model, step=2).float() / d_model * math.log(10000)
    freq = torch.exp(-emb)
    te = torch.tensor(t).float().unsqueeze(-1) * freq.unsqueeze(0)
    want = torch.stack([torch.sin(te), torch.cos(te)], dim=-1).reshape(
        len(t), d_model).numpy()
    got = np.asarray(sinusoidal_features(jnp.asarray(t), d_model))
    # atol: sin/cos of ~1e3-radian args amplify ulp-level exp() differences
    # between XLA and torch float32 — layout and frequencies are what matter.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-3)


def test_functional_time_embedding_any_t():
    m = FunctionalTimeEmbedding(d_model=8, dim=32)
    params = _init(m, jnp.zeros((2,), jnp.int32))
    # inference_T > training T works with no weight change:
    out = m.apply(params, jnp.array([0, 2999], dtype=jnp.int32))
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_table_time_embedding_shape_encodes_T():
    m = TableTimeEmbedding(T=12, d_model=8, dim=32)
    params = _init(m, jnp.zeros((2,), jnp.int32))
    table = params["params"]["table"]
    assert table.shape == (12, 8)
    # table initialised to the sinusoid table
    np.testing.assert_allclose(
        np.asarray(table),
        np.asarray(sinusoidal_features(jnp.arange(12), 8)), rtol=1e-6)


def test_conditional_embedding_null_class_is_constant():
    """Label 0 (null) must produce the same output regardless of the
    embedding table contents — padding_idx=0 parity
    (`ModelCondition.py:49-62`)."""
    m = ConditionalEmbedding(num_labels=10, d_model=8, dim=16)
    params = _init(m, jnp.zeros((2,), jnp.int32))
    out0 = m.apply(params, jnp.array([0, 0]))
    # perturb the whole table; null-class output must not move
    p2 = jax.tree.map(lambda x: x, params)
    p2 = {"params": dict(p2["params"])}
    p2["params"]["table"] = params["params"]["table"] + 100.0
    out0b = m.apply(p2, jnp.array([0, 0]))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out0b), rtol=1e-6)
    # non-null labels DO move
    out1 = m.apply(params, jnp.array([3, 7]))
    out1b = m.apply(p2, jnp.array([3, 7]))
    assert np.abs(np.asarray(out1) - np.asarray(out1b)).max() > 1e-3


@pytest.mark.slow
def test_uncond_unet_shape_and_near_identity_init(key):
    model = UNet(TINY)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.array([0, 7], dtype=jnp.int32)
    params = _init(model, x, t)
    y = model.apply(params, x, t)
    assert y.shape == x.shape
    # 1e-5-gain output convs => near-zero output at init
    assert float(jnp.abs(y).max()) < 1e-2


def test_cond_unet_shape_and_representation(key):
    model = UNet(TINY_COND)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.array([0, 7], dtype=jnp.int32)
    labels = jnp.array([1, 5], dtype=jnp.int32)
    params = _init(model, x, t, labels)
    y, rep = model.apply(params, x, t, labels, return_representation=True)
    assert y.shape == x.shape
    assert rep.shape[:3] == (2, 16, 16)  # pre-tail feature map
    # null labels give the unconditional path
    y_null = model.apply(params, x, t, jnp.zeros_like(labels))
    assert y_null.shape == x.shape


def test_cond_unet_labels_change_output(key):
    model = UNet(TINY_COND)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.array([3, 3], dtype=jnp.int32)
    params = _init(model, x, t, jnp.array([1, 2]))
    # after random init the cond path contributes; outputs for different
    # labels must differ
    y1 = model.apply(params, x, t, jnp.array([1, 1]))
    y2 = model.apply(params, x, t, jnp.array([2, 2]))
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 0


def test_dropout_rng_used_in_training_mode(key):
    model = UNet(TINY)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    params = _init(model, x, t)
    y1 = model.apply(params, x, t, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = model.apply(params, x, t, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    # different dropout masks -> different outputs
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 0


def test_vit_shape(key):
    cfg = ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=2,
                    num_heads=4, dropout=0.0)
    model = ViT(cfg)
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.array([0, 999], dtype=jnp.int32)
    params = _init(model, x, t)
    y = model.apply(params, x, t)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_vit_remat_parity(key):
    """cfg.remat must change memory behaviour only: outputs and gradients
    identical to the non-remat model (same params pytree)."""
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.array([3, 7], dtype=jnp.int32)
    cfgs = [ViTConfig(img_size=16, patch_size=4, embed_dim=32, depth=2,
                      num_heads=4, dropout=0.0, remat=r)
            for r in (False, True)]
    models = [ViT(c) for c in cfgs]
    params = _init(models[0], x, t)

    outs, grads = [], []
    for m in models:
        y = m.apply(params, x, t)
        g = jax.grad(lambda p: (m.apply(p, x, t) ** 2).sum())(params)
        outs.append(np.asarray(y))
        grads.append(g)
    assert np.allclose(outs[0], outs[1], atol=1e-5)
    for a, b in zip(jax.tree.leaves(grads[0]), jax.tree.leaves(grads[1])):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_vit_unpatchify_roundtrip_order(key):
    """Un-patchify must invert patch-extraction spatial order: with identity
    -ish head this is checked structurally by jitting and shape only; the
    stronger check is that a spatially-localised input produces a
    spatially-localised output at the same location."""
    cfg = ViTConfig(img_size=8, patch_size=4, embed_dim=16, depth=0,
                    num_heads=2, dropout=0.0)
    model = ViT(cfg)
    x = jnp.zeros((1, 8, 8, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = _init(model, x, t)
    y = jax.jit(lambda p, x, t: model.apply(p, x, t))(params, x, t)
    assert y.shape == x.shape


def test_unet_jit_compiles_once_for_multiple_t(key):
    model = UNet(TINY)
    x = jax.random.normal(key, (2, 16, 16, 3))
    params = _init(model, x, jnp.zeros((2,), jnp.int32))
    f = jax.jit(lambda p, x, t: model.apply(p, x, t))
    for tv in (0, 5, 15):
        y = f(params, x, jnp.full((2,), tv, jnp.int32))
    assert y.shape == x.shape
