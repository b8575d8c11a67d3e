"""NaN checking (checkify), profiling no-op, ViT pipeline path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_checked_sampler_detects_nan(key):
    from itsd_tpu.core import linear_schedule, sample
    from itsd_tpu.utils.debug import assert_finite, checked

    sched = linear_schedule(1e-4, 0.02, 4)

    def bad_eps(x, t):
        # model that explodes: produces inf via division by zero
        return x / jnp.zeros_like(x)

    def run(x, k):
        out = sample(sched, bad_eps, x, k, clip_output=False)
        return assert_finite(out, "x0")

    err, _ = checked(run)(jnp.ones((1, 2, 2, 1)), key)
    with pytest.raises(Exception):
        err.throw()


def test_checked_sampler_clean(key):
    from itsd_tpu.core import linear_schedule, sample
    from itsd_tpu.utils.debug import assert_finite, checked

    sched = linear_schedule(1e-4, 0.02, 4)
    run = checked(lambda x, k: assert_finite(
        sample(sched, lambda xx, tt: jnp.zeros_like(xx), x, k), "x0"))
    err, out = run(jnp.ones((1, 2, 2, 1)), key)
    err.throw()  # no error
    assert np.isfinite(np.asarray(out)).all()


def test_profiling_noop_context():
    from itsd_tpu.utils.profiling import trace
    with trace(None):
        pass  # no log dir -> no-op


def test_train_prng_impl_rbg(tmp_path):
    """train.prng_impl=rbg threads a typed rbg key through the train loop
    (the cheap TPU generator — docs/PERF.md 'ViT denoiser')."""
    from itsd_tpu.cli import runner
    from itsd_tpu.utils import Config, apply_overrides

    cfg = Config()
    apply_overrides(cfg, [
        "data.dataset=synthetic", "data.img_size=8", "model.channel=32",
        "model.channel_mult=[1]", "model.attn=[]", "model.num_res_blocks=1",
        "diffusion.T=4", "train.epoch=1", "train.batch_size=8",
        "train.eval_freq=100", "train.prng_impl=rbg",
    ])
    cfg.save_weight_dir = str(tmp_path / "c")
    cfg.sampled_dir = str(tmp_path / "s")
    cfg.metrics_save_dir = str(tmp_path / "m")
    out = runner.train(cfg, max_steps=2)
    assert np.isfinite(out["final_loss"])


def test_vit_remat_config_plumbing():
    """model.remat reaches the built ViT (docs/PERF.md 'ViT denoiser')."""
    from itsd_tpu.cli.runner import build_model
    from itsd_tpu.utils import Config, apply_overrides

    cfg = Config()
    apply_overrides(cfg, ["model.backbone=vit", "model.remat=true"])
    model, conditional = build_model(cfg)
    assert model.cfg.remat is True and conditional is False


@pytest.mark.slow
def test_vit_backbone_pipeline(tmp_path):
    from itsd_tpu.cli import runner
    from itsd_tpu.utils import Config, apply_overrides

    cfg = Config()
    apply_overrides(cfg, [
        "data.dataset=synthetic", "data.img_size=8",
        "model.backbone=vit", "model.patch_size=4", "model.embed_dim=16",
        "model.depth=1", "model.num_heads=2", "model.dropout=0.0",
        "diffusion.T=4", "train.epoch=1", "train.batch_size=8",
        "train.eval_freq=100", "train.eval_batch_size=2",
    ])
    cfg.save_weight_dir = str(tmp_path / "c")
    cfg.sampled_dir = str(tmp_path / "s")
    cfg.metrics_save_dir = str(tmp_path / "m")
    out = runner.train(cfg, max_steps=2)
    assert np.isfinite(out["final_loss"])
    ev = runner.evaluate(cfg, params=out["state"].params)
    assert ev["images"].shape == (2, 8, 8, 3)
