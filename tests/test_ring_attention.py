"""Sequence-parallel (ring) attention: sharded == single-device, fwd + grad.

The reference's 4096-token flagship attention lives on one device
(`/root/reference/Diffusion/Model.py:145-164`); `kernels/ring_attention.py`
shards the token axis over a mesh axis and rotates k/v via ppermute.
These tests prove exactness on the 8-device virtual CPU mesh:

  * forward parity vs the XLA ground-truth at several (mesh, shape) points,
  * gradient parity through the ring (scan reverse + lse-merge cotangents),
  * dp x sp composition (batch and tokens sharded simultaneously),
  * the lse-cotangent fold in the flash backward (dd := dd - dlse), in
    Pallas interpret mode — the piece ring attention adds to the kernels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.kernels.attention import _attention_xla
from itsd_tpu.kernels.ring_attention import (_attention_xla_stats,
                                             flash_attention_with_stats,
                                             sequence_sharded_attention)
from itsd_tpu.parallel import make_mesh


def _qkv(key, b, n, c, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (b, n, c), dtype)
    return mk(kq), mk(kk), mk(kv)


@pytest.mark.parametrize("seq_size,b,n,c", [
    (8, 2, 64, 8),     # full 8-way ring
    (4, 2, 96, 16),    # uneven local block (24 tokens/device)
    (2, 1, 32, 4),     # minimal ring
])
def test_ring_forward_matches_single_device(key, seq_size, b, n, c):
    mesh = make_mesh((seq_size,), ("seq",),
                     devices=jax.devices()[:seq_size])
    q, k, v = _qkv(key, b, n, c)
    ref = _attention_xla(q, k, v, float(c) ** -0.5)
    out = sequence_sharded_attention(q, k, v, mesh, axis="seq")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_gradients_match_single_device(key):
    mesh = make_mesh((4,), ("seq",), devices=jax.devices()[:4])
    q, k, v = _qkv(key, 2, 64, 8)
    tgt = jax.random.normal(jax.random.PRNGKey(7), q.shape)

    def loss_ref(q, k, v):
        return jnp.sum((_attention_xla(q, k, v, 8.0 ** -0.5) - tgt) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(
            (sequence_sharded_attention(q, k, v, mesh, axis="seq")
             - tgt) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=1e-4, rtol=1e-4)


def test_ring_composes_with_data_parallel(key):
    """dp x sp: batch over 'data', tokens over 'seq', one shard_map."""
    mesh = make_mesh((2, 4), ("data", "seq"))
    q, k, v = _qkv(key, 4, 64, 8)
    ref = _attention_xla(q, k, v, 8.0 ** -0.5)
    out = sequence_sharded_attention(q, k, v, mesh, axis="seq",
                                     batch_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_under_jit_with_sharding_constraints(key):
    """The product path jits the whole program; the ring must compile
    inside jit with mesh-placed global arrays."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh((2, 4), ("data", "seq"))
    q, k, v = _qkv(key, 4, 64, 8)
    sh = NamedSharding(mesh, P("data", "seq", None))
    q, k, v = (jax.device_put(x, sh) for x in (q, k, v))

    @jax.jit
    def run(q, k, v):
        return sequence_sharded_attention(q, k, v, mesh, axis="seq",
                                          batch_axis="data")

    ref = _attention_xla(q, k, v, 8.0 ** -0.5)
    np.testing.assert_allclose(np.asarray(run(q, k, v)), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_token_count_must_tile_over_the_ring(key):
    mesh = make_mesh((8,), ("seq",))
    q, k, v = _qkv(key, 1, 36, 4)  # 36 % 8 != 0
    with pytest.raises(AssertionError, match="must divide"):
        sequence_sharded_attention(q, k, v, mesh, axis="seq")


@pytest.mark.slow
def test_flash_stats_vjp_honors_lse_cotangent(key):
    """The ring merge differentiates through lse; the flash custom VJP
    folds that cotangent into the blockwise backward as dd - dlse.
    Verified in Pallas interpret mode against the jnp stats twin on a
    loss that consumes BOTH outputs."""
    q, k, v = _qkv(key, 1, 256, 128)  # minimal flash-eligible shape

    def loss(att, q, k, v):
        o, lse = att(q, k, v)
        return jnp.sum(jnp.sin(o)) + jnp.sum(lse ** 2)

    scale = 128.0 ** -0.5
    f_flash = functools.partial(
        loss, lambda q, k, v: flash_attention_with_stats(
            scale, True, q, k, v))
    f_ref = functools.partial(
        loss, lambda q, k, v: _attention_xla_stats(q, k, v, scale))

    np.testing.assert_allclose(float(f_flash(q, k, v)),
                               float(f_ref(q, k, v)), rtol=1e-5)
    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=2e-4, rtol=2e-4)


def test_unet_with_ring_attention_matches_xla(key):
    """Product path: model.attention_impl=ring — the UNet's AttnBlock
    shards its 8x8=64-token attention over the registered seq mesh and
    must produce the XLA path's output exactly (same params: the impl
    does not change the parameter tree)."""
    import dataclasses
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.parallel import set_seq_mesh

    cfg_x = uncond_unet_config(ch=8, ch_mult=(1, 2), attn=(1,),
                               num_res_blocks=1, dropout=0.0,
                               attention_impl="xla")
    cfg_r = dataclasses.replace(cfg_x, attention_impl="ring")
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.array([3, 7])
    params = UNet(cfg_x).init(jax.random.PRNGKey(0), x, t)
    ref = UNet(cfg_x).apply(params, x, t)
    prev = set_seq_mesh(make_mesh((1, 8), ("data", "seq")))
    try:
        out = jax.jit(lambda p, x, t: UNet(cfg_r).apply(p, x, t))(
            params, x, t)
    finally:
        set_seq_mesh(prev)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_without_mesh_uses_default_without_registering(key):
    """impl=ring with NOTHING registered uses the tokens-over-all-devices
    default (so ITSD_ATTN_IMPL=ring works standalone, not only through the
    CLI), matches XLA, and does NOT persist the default into the registry
    (a later `with mesh:` context must never be shadowed by a stale
    auto-registration)."""
    from itsd_tpu.kernels import spatial_attention
    from itsd_tpu.parallel import get_seq_mesh

    assert get_seq_mesh() is None, "registry must be clean between tests"
    q, k, v = _qkv(key, 1, 16, 4)
    out = spatial_attention(q, k, v, impl="ring")
    assert get_seq_mesh() is None, "default must not persist"
    ref = _attention_xla(q, k, v, 4.0 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_ring_ambient_mesh_context_beats_registry_default(key):
    """An explicit `with mesh:` context carrying a 'seq' axis is the most
    local statement of intent — ring attention must use it."""
    from itsd_tpu.kernels import spatial_attention

    import warnings

    mesh = make_mesh((2, 2), ("data", "seq"), devices=jax.devices()[:4])
    q, k, v = _qkv(key, 2, 18, 4)  # 18 % 2 == 0 but 18 % 8 != 0:
    # only the ambient 2-way seq axis tiles; the 8-way default would not,
    # so a fallback warning would mean the ambient mesh was NOT seen
    ref = _attention_xla(q, k, v, 4.0 ** -0.5)
    with mesh, warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        out = spatial_attention(q, k, v, impl="ring")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_ring_nontiling_tokens_warn_and_fall_back(key):
    from itsd_tpu.kernels import spatial_attention
    from itsd_tpu.parallel import set_seq_mesh

    q, k, v = _qkv(key, 1, 12, 4)  # 12 % 8 != 0 on the default mesh
    try:
        with pytest.warns(UserWarning, match="does not tile"):
            out = spatial_attention(q, k, v, impl="ring")
    finally:
        set_seq_mesh(None)
    ref = _attention_xla(q, k, v, 4.0 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_vit_with_ring_attention_matches_xla(key):
    """Second model family: the ViT's multi-head attention folds heads
    into batch and rides the same dispatch — ring must match XLA."""
    import dataclasses
    from itsd_tpu.models import ViT, ViTConfig
    from itsd_tpu.parallel import set_seq_mesh

    cfg_x = ViTConfig(img_size=16, patch_size=2, embed_dim=32, depth=2,
                      num_heads=4, dropout=0.0, attention_impl="xla")
    cfg_r = dataclasses.replace(cfg_x, attention_impl="ring")
    x = jax.random.normal(key, (2, 16, 16, 3))
    t = jnp.array([3, 7])
    params = ViT(cfg_x).init(jax.random.PRNGKey(0), x, t)
    ref = ViT(cfg_x).apply(params, x, t)
    prev = set_seq_mesh(make_mesh((1, 8), ("data", "seq")))
    try:
        out = ViT(cfg_r).apply(params, x, t)
    finally:
        set_seq_mesh(prev)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ring_bf16_matches_xla_bf16(key):
    """The flagship runs bf16: ring partials accumulate in f32 and merge
    in log-space, so bf16 ring must track the bf16 XLA path within bf16
    resolution."""
    mesh = make_mesh((4,), ("seq",), devices=jax.devices()[:4])
    q, k, v = _qkv(key, 2, 64, 32, dtype=jnp.bfloat16)
    ref = _attention_xla(q, k, v, 32.0 ** -0.5)
    out = sequence_sharded_attention(q, k, v, mesh, axis="seq")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=2e-2, rtol=2e-2)
