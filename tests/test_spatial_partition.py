"""Spatial partitioning (image rows over a mesh axis): sharded == unsharded.

The reference's scaling wall is per-chip memory at 256x256
(`/root/reference/Diffusion/Model.py:152-161`; docs/PERF.md "batch scaling
is memory-limited"). `parallel.spatial_sharding` shards the H dim of NHWC
activations over a 'seq' mesh axis so per-chip activation memory scales
down with the axis — XLA GSPMD partitions the convs (halo exchange for 3x3
windows) and cross-reduces GroupNorm statistics. These tests pin the whole
thing numerically on the virtual mesh:

  * one train step (fwd+bwd+AdamW+EMA) on a dp x sp mesh == single device,
  * a UNet WITH an attention stage under dp x sp — the H-major token
    flatten feeds ring attention on the same 'seq' axis,
  * the ancestral sampler under spatial sharding == unsharded.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.core import linear_schedule, sample
from itsd_tpu.models import UNet, uncond_unet_config
from itsd_tpu.parallel import (make_mesh, set_seq_mesh, shard_batch,
                               spatial_sharding)
from itsd_tpu.train import (OptimizerConfig, create_train_state,
                            make_optimizer, make_train_step)

SCHED = linear_schedule(1e-4, 0.02, 16)


def _state_and_step(cfg, lr=1e-5):
    model = UNet(cfg)
    x = jnp.zeros((4, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((4,), jnp.int32))
    tx = make_optimizer(OptimizerConfig(lr=lr, epochs=2, steps_per_epoch=4))
    state = create_train_state(params, tx)
    step = make_train_step(
        lambda p, *a, **kw: model.apply(p, *a, **kw), SCHED, tx,
        donate=False)
    return model, state, step


def _assert_trees_close(a_tree, b_tree, rtol=2e-4, atol=2e-6):
    for a, b in zip(jax.tree.leaves(a_tree), jax.tree.leaves(b_tree)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=rtol, atol=atol)


def test_spatial_train_step_matches_single_device(key):
    """dp x sp train step: batch over 'data', image ROWS over 'seq'."""
    assert jax.device_count() >= 8
    cfg = uncond_unet_config(ch=16, ch_mult=(1, 2), attn=(), dropout=0.0,
                             num_res_blocks=1)
    _, state, step = _state_and_step(cfg)
    batch = {"image": jax.random.normal(key, (8, 16, 16, 3)) * 0.5}
    k = jax.random.PRNGKey(7)
    s_ref, m_ref = step(state, batch, k)

    mesh = make_mesh((2, 4), ("data", "seq"))
    state_s = state.replace(
        params=jax.device_put(state.params),
        ema_params=jax.device_put(state.ema_params),
        opt_state=jax.device_put(state.opt_state),
    )
    batch_s = shard_batch(batch, mesh, spatial_axis="seq")
    # the input really is H-sharded (4 rows per device along dim 2)
    spec = batch_s["image"].sharding.spec
    assert tuple(spec)[:2] == ("data", "seq"), spec
    s_sp, m_sp = step(state_s, batch_s, k)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_sp["loss"]),
                               rtol=1e-5)
    _assert_trees_close(s_ref.params, s_sp.params)
    _assert_trees_close(s_ref.ema_params, s_sp.ema_params)


@pytest.mark.slow
def test_spatial_step_with_attention_and_ring(key):
    """The flagship shape in miniature: a UNet with an attention stage,
    image rows sharded over 'seq', ring attention registered on the SAME
    mesh — the H-major token flatten keeps the shardings aligned, so the
    whole step runs spatially partitioned end-to-end."""
    assert jax.device_count() >= 8
    base = uncond_unet_config(ch=16, ch_mult=(1, 2), attn=(1,), dropout=0.0,
                              num_res_blocks=1, attention_impl="xla")
    _, state, step = _state_and_step(base)
    batch = {"image": jax.random.normal(key, (8, 16, 16, 3)) * 0.5}
    k = jax.random.PRNGKey(7)
    s_ref, m_ref = step(state, batch, k)

    mesh = make_mesh((2, 4), ("data", "seq"))
    cfg_r = dataclasses.replace(base, attention_impl="ring")
    model_r = UNet(cfg_r)
    tx = make_optimizer(OptimizerConfig(lr=1e-5, epochs=2, steps_per_epoch=4))
    step_r = make_train_step(
        lambda p, *a, **kw: model_r.apply(p, *a, **kw), SCHED, tx,
        donate=False)
    batch_s = shard_batch(batch, mesh, spatial_axis="seq")
    prev = set_seq_mesh(mesh)
    try:
        s_sp, m_sp = step_r(state, batch_s, k)
    finally:
        set_seq_mesh(prev)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_sp["loss"]),
                               rtol=1e-5)
    _assert_trees_close(s_ref.params, s_sp.params)


def test_spatially_sharded_sampler_matches_unsharded(key):
    """Inference too: the T=16 ancestral sampler with the initial noise
    H-sharded produces the unsharded images exactly."""
    assert jax.device_count() >= 8
    cfg = uncond_unet_config(ch=16, ch_mult=(1, 2), attn=(), dropout=0.0,
                             num_res_blocks=1)
    model = UNet(cfg)
    x = jnp.zeros((2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    eps_fn = lambda xx, tt: model.apply(params, xx, tt)
    noise = jax.random.normal(key, (2, 16, 16, 3))

    ref = sample(SCHED, eps_fn, noise, jax.random.PRNGKey(3))

    mesh = make_mesh((2, 4), ("data", "seq"))
    noise_s = jax.device_put(noise, spatial_sharding(mesh))
    out = jax.jit(lambda n: sample(SCHED, eps_fn, n,
                                   jax.random.PRNGKey(3)))(noise_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_evaluate_cli_path_with_spatial_shard(tmp_path, key):
    """Product eval path: train.spatial_shard places the initial noise
    H-sharded (runner._maybe_spatial_put) and the sampled images equal
    the unsharded run exactly."""
    import copy

    from itsd_tpu.cli import runner
    from itsd_tpu.parallel import set_seq_mesh
    from itsd_tpu.utils.config import Config

    cfg = Config()
    cfg.data.dataset = "synthetic"
    cfg.data.img_size = 16
    cfg.model.channel = 8
    cfg.model.channel_mult = (1, 2)
    cfg.model.attn = (1,)
    cfg.model.num_res_blocks = 1
    cfg.model.dropout = 0.0
    cfg.diffusion.T = 8
    cfg.train.eval_batch_size = 4
    cfg.sampled_dir = str(tmp_path / "ref")

    model, conditional = runner.build_model(cfg)
    assert not conditional
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))

    ref = runner.evaluate(cfg, params=params)["images"]

    from itsd_tpu.parallel import get_seq_mesh

    cfg_sp = copy.deepcopy(cfg)
    cfg_sp.train.spatial_shard = 4
    cfg_sp.sampled_dir = str(tmp_path / "sp")
    try:
        out = runner.evaluate(cfg_sp, params=params)["images"]
        # the entry point must scope its layout, not leak it (the registry
        # is process-global; a later run would inherit a stale mesh)
        assert get_seq_mesh() is None, "evaluate leaked its seq mesh"
    finally:
        set_seq_mesh(None)  # belt-and-braces for other tests
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_auto_attention_routes_through_ring_under_spatial_mesh(key):
    """model.attention_impl=auto must compose with spatial partitioning:
    with a seq>1 mesh registered (what train.spatial_shard does), the
    dispatch routes through ring attention — the plain flash custom call
    cannot be spatially partitioned by GSPMD — and stays exact."""
    from itsd_tpu.kernels import spatial_attention
    from itsd_tpu.kernels.attention import _attention_xla
    from itsd_tpu.parallel import seq_mesh_scope

    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 64, 8))
    k = jax.random.normal(kk, q.shape)
    v = jax.random.normal(kv, q.shape)
    ref = _attention_xla(q, k, v, 8.0 ** -0.5)
    mesh = make_mesh((2, 4), ("data", "seq"))
    with seq_mesh_scope(mesh):
        out = spatial_attention(q, k, v, impl="auto")
        # proof it took the ring path, not plain XLA: the result is an
        # f32 merge of per-shard partials — assert exactness AND that the
        # sharded program ran by checking the output sharding
        assert "seq" in str(out.sharding), out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_shard_batch_process_local_with_spatial(rng):
    """The multi-host feed path (make_array_from_process_local_data)
    composed with spatial sharding: images land P(data, seq), labels stay
    P(data), and the global content is bit-identical to the host batch."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh((2, 4), ("data", "seq"))
    batch = {"image": rng.normal(size=(8, 16, 16, 3)).astype(np.float32),
             "label": np.arange(8, dtype=np.int32)}
    out = shard_batch(batch, mesh, process_local=True, spatial_axis="seq")
    assert tuple(out["image"].sharding.spec)[:2] == ("data", "seq")
    assert tuple(out["label"].sharding.spec) == ("data",)
    np.testing.assert_array_equal(np.asarray(out["image"]), batch["image"])
    np.testing.assert_array_equal(np.asarray(out["label"]), batch["label"])
