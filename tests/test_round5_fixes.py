"""Regression tests for round-5 ADVICE fixes and VERDICT directives."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from itsd_tpu.core import linear_schedule, make_cfg_eps_fn, sample


def _eps3(x, t, lab):
    return x * 0.1 + lab.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)


LABELS = jnp.ones((2,), jnp.int32)


def test_reversed_concrete_interval_raises():
    # ADVICE r4: a reversed (lo > hi) interval silently produced plain
    # unguided sampling; now it fails fast at build time
    with pytest.raises(ValueError, match="reversed"):
        make_cfg_eps_fn(_eps3, LABELS, w=1.0, interval=(500, 100))
    # concrete jnp scalars validate too
    with pytest.raises(ValueError, match="reversed"):
        make_cfg_eps_fn(_eps3, LABELS, w=1.0,
                        interval=(jnp.int32(9), jnp.int32(3)))
    # lo == hi is the explicit "guidance off" arm, NOT an error
    f = make_cfg_eps_fn(_eps3, LABELS, w=1.0, interval=(100, 100))
    f(jnp.ones((2, 4, 4, 1)), jnp.zeros((2,), jnp.int32))


def test_valid_and_traced_intervals_still_work():
    x = jnp.ones((2, 4, 4, 1))
    t = jnp.zeros((2,), jnp.int32)
    ok = make_cfg_eps_fn(_eps3, LABELS, w=1.0, interval=(0, 8))
    ok(x, t)  # no error

    # traced lo/hi skip the build-time check (sweep programs trace once,
    # feed many intervals) and still produce a working program
    def run(lo, hi):
        f = make_cfg_eps_fn(_eps3, LABELS, w=1.0, interval=(lo, hi))
        return f(x, t)

    out = jax.jit(run)(jnp.int32(0), jnp.int32(8))
    assert out.shape == x.shape


# ---------------------------------------------------------------------------
# VERDICT r4 weak #4: tracked IS must be routable to a TRAINED classifier
# (random-weight Inception gives constant splits -> IS == 1.0 everywhere)


def _saved_classifier(tmp_path, num_classes=4, img=8):
    from itsd_tpu.models.classifier import (ClassifierConfig,
                                            save_classifier,
                                            train_classifier)
    rng = np.random.default_rng(0)
    labels = rng.integers(0, num_classes, 64)
    # class-dependent mean so even a 1-epoch classifier separates them
    images = (rng.normal(0, 0.1, (64, img, img, 3))
              + labels[:, None, None, None] / num_classes).astype(np.float32)
    _, params, _ = train_classifier(
        images, labels, ClassifierConfig(num_classes=num_classes, ch=8,
                                         depth=2),
        epochs=2, batch_size=16)
    path = str(tmp_path / f"classifier_synthetic{img}")
    save_classifier(path, params)
    return path


def test_classifier_extractors_shapes(tmp_path):
    from itsd_tpu.models.classifier import load_classifier_extractors
    path = _saved_classifier(tmp_path)
    feature_fn, logit_fn, prov = load_classifier_extractors(path)
    x = jnp.asarray(np.random.default_rng(1).random((6, 8, 8, 3)),
                    jnp.float32)
    logits = logit_fn(x)
    feats = feature_fn(x)
    assert logits.shape == (6, 4)
    assert feats.ndim == 2 and feats.shape[0] == 6
    assert "dataset-specific" in prov
    # logits must VARY across images (the whole point vs the constant
    # random-Inception splits)
    assert float(jnp.std(jnp.argmax(logits, -1).astype(jnp.float32))) >= 0 \
        and float(jnp.abs(logits - logits[0]).max()) > 1e-6


def test_is_logit_source_resolution(tmp_path):
    from itsd_tpu.cli.runner import resolve_is_logit_fn
    from itsd_tpu.utils import Config, apply_overrides

    cfg = Config()
    apply_overrides(cfg, ["data.dataset=synthetic", "data.img_size=8"])
    cfg.save_weight_dir = str(tmp_path)
    sentinel = lambda x: x

    # auto + no classifier checkpoint -> keep the inception fallback
    fn, prov = resolve_is_logit_fn(cfg, sentinel, "random")
    assert fn is sentinel and prov == "random"

    # auto + pretrained inception -> keep inception even if ckpt exists
    path = _saved_classifier(tmp_path)
    fn, prov = resolve_is_logit_fn(cfg, sentinel, "pretrained")
    assert fn is sentinel and prov == "pretrained"

    # auto + random inception + matching ckpt -> classifier takes over
    fn, prov = resolve_is_logit_fn(cfg, sentinel, "random")
    assert fn is not sentinel and prov.startswith("classifier:")

    # forced inception ignores the ckpt
    cfg.train.is_logit_source = "inception"
    fn, prov = resolve_is_logit_fn(cfg, sentinel, "random")
    assert fn is sentinel

    # explicit path
    cfg.train.is_logit_source = path
    fn, prov = resolve_is_logit_fn(cfg, sentinel, "random")
    assert fn is not sentinel and path in prov


def test_tracked_is_moves_with_classifier_logits(tmp_path, monkeypatch):
    """End-to-end: inference-metrics with an in-domain classifier logit
    source produces an IS column that is not the constant 1.0."""
    from itsd_tpu.cli import runner
    from itsd_tpu.utils import Config, apply_overrides

    monkeypatch.setenv("ITSD_PIXEL_FEATURES", "1")
    cfg = Config()
    apply_overrides(cfg, [
        "data.dataset=synthetic", "data.img_size=8",
        "model.channel=16", "model.channel_mult=[1]", "model.attn=[]",
        "model.num_res_blocks=1", "model.dropout=0.0",
        "diffusion.T=8", "train.eval_batch_size=8",
        "train.metric_interval=4", "train.is_splits=4",
    ])
    cfg.save_weight_dir = str(tmp_path)
    cfg.sampled_dir = str(tmp_path / "sampled")
    cfg.metrics_save_dir = str(tmp_path / "metrics")
    _saved_classifier(tmp_path)

    # random init params via evaluate-less path: train 0 steps is heavy;
    # call inference_metrics with a fresh-init checkpointless model by
    # saving init params as an eval checkpoint
    import jax as _jax
    from itsd_tpu.cli.runner import build_model
    from itsd_tpu.train.checkpoint import save_params
    model, _ = build_model(cfg)
    params = model.init(_jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32))
    save_params(str(tmp_path / "init_ckpt"), _jax.device_get(params))
    cfg.test_load_weight = "init_ckpt"

    out = runner.inference_metrics(cfg)
    assert out["is_logit_source"].startswith("classifier:")
    is_col = [h[2] for h in out["history"]]
    assert np.isfinite(is_col).all()
    # with 4-class logits that vary across images, IS is not pinned at the
    # EXACT 1.0 the constant random-Inception splits produce (on random-init
    # junk samples a good classifier predicts one class almost uniformly,
    # so the value stays close to 1 — exactness is the discriminator here;
    # the flagship run on a trained model shows the full dynamic range)
    assert any(abs(v - 1.0) > 1e-7 for v in is_col), is_col
    import json as _json
    with open(tmp_path / "metrics" / "metrics_meta.json") as f:
        meta = _json.load(f)
    assert meta["is_logit_source"].startswith("classifier:")


# ---------------------------------------------------------------------------
# Autoguidance (Karras et al. 2024): strong-vs-weak conditional guidance


def _affine_eps(scale):
    def fn(x, t, lab):
        return scale * x + lab.reshape(
            (-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    return fn


def test_autoguidance_mix_algebra():
    from itsd_tpu.core import cfg_combine, make_autoguidance_eps_fn
    strong, weak = _affine_eps(0.2), _affine_eps(0.5)
    labels = jnp.array([1, 2], jnp.int32)
    x = jnp.ones((2, 4, 4, 1))
    t = jnp.zeros((2,), jnp.int32)

    # w=0 -> exactly the strong model's conditional forward
    f0 = make_autoguidance_eps_fn(strong, weak, labels, w=0.0)
    np.testing.assert_allclose(np.asarray(f0(x, t)),
                               np.asarray(strong(x, t, labels)))

    # general w -> (1+w)*strong - w*weak, elementwise
    f = make_autoguidance_eps_fn(strong, weak, labels, w=1.5)
    want = cfg_combine(strong(x, t, labels), weak(x, t, labels), 1.5)
    np.testing.assert_allclose(np.asarray(f(x, t)), np.asarray(want),
                               rtol=1e-6)

    # candidate-folded batch (N*B rows) tiles the labels
    x4 = jnp.ones((4, 4, 4, 1))
    t4 = jnp.zeros((4,), jnp.int32)
    lab4 = jnp.tile(labels, 2)
    np.testing.assert_allclose(
        np.asarray(f(x4, t4)),
        np.asarray(cfg_combine(strong(x4, t4, lab4),
                               weak(x4, t4, lab4), 1.5)), rtol=1e-6)

    # interval: outside [lo, hi) the step is the strong forward alone
    fi = make_autoguidance_eps_fn(strong, weak, labels, w=1.5,
                                  interval=(2, 6))
    t_out = jnp.full((2,), 7, jnp.int32)
    np.testing.assert_allclose(np.asarray(fi(x, t_out)),
                               np.asarray(strong(x, t_out, labels)))
    t_in = jnp.full((2,), 3, jnp.int32)
    np.testing.assert_allclose(
        np.asarray(fi(x, t_in)),
        np.asarray(cfg_combine(strong(x, t_in, labels),
                               weak(x, t_in, labels), 1.5)), rtol=1e-6)

    # reversed interval fails fast, same contract as CFG
    with pytest.raises(ValueError, match="reversed"):
        make_autoguidance_eps_fn(strong, weak, labels, w=1.0,
                                 interval=(6, 2))


def test_autoguidance_cli_end_to_end(tmp_path):
    """diffusion.guidance=auto through evaluate: strong + weak conditional
    checkpoints, plus the two config error paths."""
    import jax as _jax
    from itsd_tpu.cli import runner
    from itsd_tpu.train.checkpoint import save_params
    from itsd_tpu.utils import Config, apply_overrides

    cfg = Config()
    apply_overrides(cfg, [
        "data.dataset=synthetic", "data.img_size=8",
        "model.channel=16", "model.channel_mult=[1]", "model.attn=[]",
        "model.num_res_blocks=1", "model.dropout=0.0",
        "model.num_labels=10", "model.time_embed=functional",
        "diffusion.T=8", "diffusion.w=1.5", "train.eval_batch_size=4",
    ])
    cfg.save_weight_dir = str(tmp_path)
    cfg.sampled_dir = str(tmp_path / "sampled")
    model, conditional = runner.build_model(cfg)
    assert conditional
    for name, seed in (("strong_ckpt", 0), ("weak_ckpt", 1)):
        params = model.init(_jax.random.PRNGKey(seed),
                            jnp.zeros((1, 8, 8, 3)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1,), jnp.int32))
        save_params(str(tmp_path / name), _jax.device_get(params))
    cfg.test_load_weight = "strong_ckpt"

    cfg.diffusion.guidance = "auto"
    with pytest.raises(ValueError, match="weak_load_weight"):
        runner.evaluate(cfg)
    cfg.diffusion.weak_load_weight = "weak_ckpt"
    out = runner.evaluate(cfg)
    assert out["images"].shape == (4, 8, 8, 3)
    assert np.isfinite(out["images"]).all()

    # autoguidance differs from CFG on the same weights
    cfg2 = Config()
    apply_overrides(cfg2, [
        "data.dataset=synthetic", "data.img_size=8",
        "model.channel=16", "model.channel_mult=[1]", "model.attn=[]",
        "model.num_res_blocks=1", "model.dropout=0.0",
        "model.num_labels=10", "model.time_embed=functional",
        "diffusion.T=8", "diffusion.w=1.5", "train.eval_batch_size=4",
    ])
    cfg2.save_weight_dir = str(tmp_path)
    cfg2.sampled_dir = str(tmp_path / "sampled2")
    cfg2.test_load_weight = "strong_ckpt"
    out_cfg = runner.evaluate(cfg2)
    assert np.abs(out["images"] - out_cfg["images"]).max() > 1e-6


def test_autoguidance_through_search_cli(tmp_path):
    """The search path builds its eps_fn through the same wiring: a tiny
    best-of-2 random search under diffusion.guidance=auto runs end-to-end
    and differs from the CFG search on identical weights/keys."""
    import copy

    import jax as _jax
    from itsd_tpu.cli import runner
    from itsd_tpu.train.checkpoint import save_params
    from itsd_tpu.utils import Config, apply_overrides

    cfg = Config()
    apply_overrides(cfg, [
        "data.dataset=synthetic", "data.img_size=8",
        "model.channel=16", "model.channel_mult=[1]", "model.attn=[]",
        "model.num_res_blocks=1", "model.dropout=0.0",
        "model.num_labels=10", "model.time_embed=functional",
        "diffusion.T=8", "diffusion.w=1.0",
        "search.algorithm=random", "search.n_candidates=2",
        "search.verifier=self_supervised", "train.eval_batch_size=2",
    ])
    cfg.save_weight_dir = str(tmp_path)
    cfg.sampled_dir = str(tmp_path / "sampled")
    model, _ = runner.build_model(cfg)
    for name, seed in (("strong_ckpt", 0), ("weak_ckpt", 1)):
        params = model.init(_jax.random.PRNGKey(seed),
                            jnp.zeros((1, 8, 8, 3)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1,), jnp.int32))
        save_params(str(tmp_path / name), _jax.device_get(params))
    cfg.test_load_weight = "strong_ckpt"

    cfg_auto = copy.deepcopy(cfg)
    cfg_auto.diffusion.guidance = "auto"
    cfg_auto.diffusion.weak_load_weight = "weak_ckpt"
    out_auto = runner.run_search(cfg_auto)
    out_cfg = runner.run_search(cfg)
    assert np.isfinite(out_auto["best_score"])
    assert out_auto["best_score"] != out_cfg["best_score"]
