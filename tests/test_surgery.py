"""Cross-T checkpoint surgery and freeze-except-time-embedding fine-tuning."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from itsd_tpu.models import UNet, cond_unet_config, uncond_unet_config
from itsd_tpu.models.embeddings import sinusoidal_features
from itsd_tpu.train.surgery import (detect_checkpoint_T,
                                    extend_time_embedding,
                                    freeze_except_time_embedding,
                                    time_embedding_mask)

COND = cond_unet_config(num_labels=10, ch=32, ch_mult=(1,), num_res_blocks=1,
                        dropout=0.0, T=16)
UNCOND = uncond_unet_config(ch=32, ch_mult=(1,), attn=(), num_res_blocks=1,
                            dropout=0.0)


def _params(cfg, conditional):
    model = UNet(cfg)
    x = jnp.zeros((2, 8, 8, 3))
    t = jnp.zeros((2,), jnp.int32)
    if conditional:
        return model, model.init(jax.random.PRNGKey(0), x, t,
                                 jnp.zeros((2,), jnp.int32))
    return model, model.init(jax.random.PRNGKey(0), x, t)


def test_detect_checkpoint_T():
    _, p_table = _params(COND, True)
    assert detect_checkpoint_T(p_table) == 16
    _, p_func = _params(UNCOND, False)
    assert detect_checkpoint_T(p_func) is None  # functional: T-agnostic


def test_extend_interpolate_endpoints_preserved():
    _, p = _params(COND, True)
    p2 = extend_time_embedding(p, 31, strategy="interpolate")
    assert detect_checkpoint_T(p2) == 31
    old = np.asarray(p["params"]["time_embedding"]["table"])
    new = np.asarray(p2["params"]["time_embedding"]["table"])
    np.testing.assert_allclose(new[0], old[0], rtol=1e-6)
    np.testing.assert_allclose(new[-1], old[-1], rtol=1e-6)
    # midpoint of a 16->31 upsample hits every old row exactly (stride 2)
    np.testing.assert_allclose(new[2], old[1], rtol=1e-6)
    # MLP untouched
    np.testing.assert_allclose(
        np.asarray(p2["params"]["time_embedding"]["mlp"]["fc1"]["kernel"]),
        np.asarray(p["params"]["time_embedding"]["mlp"]["fc1"]["kernel"]))


def test_extend_reinit_is_fresh_sinusoid():
    _, p = _params(COND, True)
    p2 = extend_time_embedding(p, 32, strategy="reinit")
    new = np.asarray(p2["params"]["time_embedding"]["table"])
    want = np.asarray(sinusoidal_features(jnp.arange(32), new.shape[1]))
    np.testing.assert_allclose(new, want, rtol=1e-5)


def test_extended_model_runs():
    """After surgery, the model must run at the new T (the whole point of
    `fine_tune_extended_T.py`)."""
    model32 = UNet(cond_unet_config(num_labels=10, ch=32, ch_mult=(1,),
                                    num_res_blocks=1, dropout=0.0, T=32))
    _, p16 = _params(COND, True)
    p32 = extend_time_embedding(p16, 32, strategy="interpolate")
    x = jnp.zeros((2, 8, 8, 3))
    out = model32.apply(p32, x, jnp.array([0, 31]), jnp.array([1, 2]))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_freeze_except_time_embedding():
    _, p = _params(COND, True)
    mask = time_embedding_mask(p)
    # exactly the time_embedding subtree is True
    te_leaves = jax.tree.leaves(mask["params"]["time_embedding"])
    assert all(te_leaves) and len(te_leaves) > 0
    other = {k: v for k, v in mask["params"].items()
             if k != "time_embedding"}
    assert not any(jax.tree.leaves(other))

    tx = freeze_except_time_embedding(optax.sgd(1.0), p)
    state = tx.init(p)
    grads = jax.tree.map(jnp.ones_like, p)
    updates, _ = tx.update(grads, state, p)
    # non-time-embedding updates are exactly zero
    for k, v in updates["params"].items():
        leaves = jax.tree.leaves(v)
        if k == "time_embedding":
            assert all(float(jnp.abs(l).max()) > 0 for l in leaves)
        else:
            assert all(float(jnp.abs(l).max()) == 0 for l in leaves)
