"""End-to-end integration: tiny train -> sample -> search on synthetic data,
all through the CLI config path. The tiny-fixture analogue of the
reference's full-system runs (SURVEY §4 recommends exactly this)."""

import os

import numpy as np
import pytest

from itsd_tpu.utils import Config, apply_overrides


def _tiny_cfg(tmp_path, conditional=False):
    cfg = Config()
    apply_overrides(cfg, [
        "data.dataset=synthetic", "data.img_size=8",
        "model.channel=16", "model.channel_mult=[1]",
        "model.attn=[]", "model.num_res_blocks=1", "model.dropout=0.0",
        "diffusion.T=8",
        "train.epoch=2", "train.batch_size=8", "train.eval_freq=100",
        "train.model_save_freq=1", "train.eval_batch_size=4",
    ])
    if conditional:
        apply_overrides(cfg, ["model.num_labels=10",
                              "model.time_embed=table",
                              "train.loss_reduction=sum_div_b2",
                              "diffusion.w=1.8"])
    cfg.save_weight_dir = str(tmp_path / "ckpt")
    cfg.sampled_dir = str(tmp_path / "sampled")
    cfg.metrics_save_dir = str(tmp_path / "metrics")
    return cfg


@pytest.mark.slow
def test_train_then_eval_uncond(tmp_path):
    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path)
    out = runner.train(cfg, max_steps=6)
    assert out["final_loss"] is not None and np.isfinite(out["final_loss"])
    assert out["checkpoints"]
    # eval from the saved checkpoint
    cfg.test_load_weight = os.path.basename(out["checkpoints"][-1])
    ev = runner.evaluate(cfg)
    assert ev["images"].shape == (4, 8, 8, 3)
    assert os.path.exists(ev["path"])
    assert os.path.exists(os.path.join(cfg.metrics_save_dir,
                                       "train_metrics.jsonl"))
    assert os.path.exists(os.path.join(cfg.metrics_save_dir,
                                       "loss_curve.png"))


@pytest.mark.slow
def test_train_cfg_conditional(tmp_path):
    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path, conditional=True)
    out = runner.train(cfg, max_steps=4)
    assert np.isfinite(out["final_loss"])
    ev = runner.evaluate(cfg, params=out["state"].params)
    assert ev["images"].shape == (4, 8, 8, 3)


@pytest.mark.slow
def test_search_loads_full_training_checkpoint(tmp_path):
    """Regression: `train` writes FULL checkpoints (step/params/opt/EMA);
    search/eval/finetune must load those, not just weights-only dumps
    (found by driving the CLI — the test suite passed params in-memory)."""
    import os
    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path)
    out = runner.train(cfg, max_steps=2)
    cfg.test_load_weight = os.path.basename(out["checkpoints"][-1])
    apply_overrides(cfg, ["search.algorithm=random",
                          "search.n_candidates=2",
                          "search.verifier=aesthetic"])
    res = runner.run_search(cfg)  # params loaded from the checkpoint
    assert np.isfinite(res["best_score"])


@pytest.mark.slow
def test_search_cli_path(tmp_path):
    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path)
    out = runner.train(cfg, max_steps=2)
    cfg.test_load_weight = None
    for algo in ("random", "zero_order", "path"):
        apply_overrides(cfg, [f"search.algorithm={algo}",
                              "search.n_candidates=2",
                              "search.n_iterations=2",
                              "search.n_neighbors=2",
                              "search.n_paths=2", "search.n_active=1",
                              "search.injection_steps=[4]",
                              "search.delta_f=2"])
        res = runner.run_search(cfg, params=out["state"].params)
        assert np.isfinite(res["best_score"]), algo
        assert res["nfes"] > 0


def test_conditional_search_folds_candidates(tmp_path):
    """Conditional (CFG) search with n_candidates>1: the candidate fold must
    tile the per-batch labels (regression — crashed on the ImageNet-64
    workload-5 config before the fix in core/process.py)."""
    import jax
    import jax.numpy as jnp
    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path, conditional=True)
    apply_overrides(cfg, ["search.algorithm=random",
                          "search.n_candidates=3",
                          "search.verifier=self_supervised"])
    model, conditional = runner.build_model(cfg)
    assert conditional
    x = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3))
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    res = runner.run_search(cfg, params=params)
    assert np.isfinite(res["best_score"])


def test_search_respects_fast_sampler(tmp_path):
    """diffusion.sampler=dpm flows into the search denoiser: a best-of-N
    over 4-step DPM-Solver candidates (the winning fixed-budget allocation,
    docs/RESULTS.md Axis 3) must run through the product path."""
    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path)
    apply_overrides(cfg, ["search.algorithm=random",
                          "search.n_candidates=3",
                          "search.verifier=self_supervised",
                          "diffusion.sampler=dpm",
                          "diffusion.ddim_steps=4"])
    model, _ = runner.build_model(cfg)
    import jax
    import jax.numpy as jnp
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.data.img_size, cfg.data.img_size,
                                   3)), jnp.zeros((1,), jnp.int32))
    res = runner.run_search(cfg, params=params)
    assert np.isfinite(res["best_score"])


def test_random_search_candidate_chunking(tmp_path):
    """search.candidate_chunk splits a big random search into several
    shorter device launches (one compiled program, reused); the result must
    cover all n_candidates and best_score must be the max over every chunk's
    scores."""
    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path)
    apply_overrides(cfg, ["search.algorithm=random",
                          "search.n_candidates=6",
                          "search.candidate_chunk=2",
                          "search.verifier=self_supervised"])
    model, _ = runner.build_model(cfg)
    import jax
    import jax.numpy as jnp
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, cfg.data.img_size, cfg.data.img_size,
                                   3)), jnp.zeros((1,), jnp.int32))
    res = runner.run_search(cfg, params=params)
    scores = np.asarray(res["result"].history["scores"]).ravel()
    assert scores.size == 6
    assert np.isclose(res["best_score"], scores.max())


@pytest.mark.slow
def test_metric_tracked_sampling(tmp_path):
    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path)
    apply_overrides(cfg, ["train.metric_interval=4"])
    out = runner.train(cfg, max_steps=2)

    def feature_fn(unit_images):
        return unit_images.reshape(unit_images.shape[0], -1)[:, :16]

    real_feats = np.random.default_rng(0).uniform(
        0, 1, (64, 16)).astype(np.float32)
    res = runner.sample_with_metrics(cfg, out["state"].params,
                                     feature_fn=feature_fn,
                                     real_features=real_feats)
    assert len(res["history"]) == 2  # T=8, interval=4
    fids = [h[1] for h in res["history"]]
    assert all(np.isfinite(f) for f in fids)
    assert os.path.exists(os.path.join(cfg.metrics_save_dir,
                                       "metrics_history.json"))
    assert os.path.exists(os.path.join(cfg.metrics_save_dir,
                                       "metrics_curves.png"))


@pytest.mark.slow
def test_finetune_extended_T(tmp_path):
    from itsd_tpu.cli import runner
    from itsd_tpu.train.checkpoint import save_params
    import jax

    # train a tiny table-embedding model at T=8, then extend to T=16
    cfg = _tiny_cfg(tmp_path, conditional=True)
    out = runner.train(cfg, max_steps=2)
    save_params(os.path.join(cfg.save_weight_dir, "base"),
                jax.device_get(out["state"].params))

    cfg2 = _tiny_cfg(tmp_path, conditional=True)
    apply_overrides(cfg2, ["diffusion.T=16", "train.epoch=1"])
    cfg2.test_load_weight = "base"
    ft = runner.finetune_extended_T(cfg2, max_steps=2)
    assert ft["ckpt_T_detected"] == 8
    assert np.isfinite(ft["final_loss"])
    assert ft["checkpoints"]


@pytest.mark.slow
def test_cli_main_smoke(tmp_path, capsys):
    from itsd_tpu.cli.main import main
    rc = main(["train", "data.dataset=synthetic", "data.img_size=8",
               "model.channel=16", "model.channel_mult=[1]", "model.attn=[]",
               "model.num_res_blocks=1", "diffusion.T=4", "train.epoch=1",
               "train.batch_size=8", "train.eval_freq=100",
               f"save_weight_dir={tmp_path}/ck",
               f"sampled_dir={tmp_path}/s",
               f"metrics_save_dir={tmp_path}/m"])
    assert rc == 0


@pytest.mark.slow
def test_inference_metrics_on_full_checkpoint(tmp_path, monkeypatch):
    """VERDICT r1 item 2: inference-metrics must load the FULL training
    checkpoints that `train` writes (EMA-preferring, via load_eval_params),
    track CLIP alongside FID/IS, and honor the configurable IS-split
    protocol (reference default 10, `utils/metrics.py:377-417`)."""
    import jax.numpy as jnp

    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path)
    apply_overrides(cfg, ["train.metric_interval=4", "train.is_splits=10"])
    out = runner.train(cfg, max_steps=2)
    cfg.test_load_weight = os.path.basename(out["checkpoints"][-1])

    monkeypatch.setenv("ITSD_PIXEL_FEATURES", "1")  # fast FID extractor

    def fake_clip(unit_images):  # stand-in CLIP tower: pooled pixels
        return unit_images.reshape(unit_images.shape[0], -1)[:, :8]

    def fake_logits(unit_images):
        flat = unit_images.reshape(unit_images.shape[0], -1)
        return jnp.stack([flat[:, i] for i in range(4)], axis=-1)

    res = runner.inference_metrics(cfg, logit_fn=fake_logits,
                                   clip_feature_fn=fake_clip)
    assert len(res["history"]) == 2  # T=8, interval=4
    for (_, fid, is_mean, clip_s) in res["history"]:
        assert np.isfinite(fid)
        assert np.isfinite(is_mean)
        assert np.isfinite(clip_s)
    assert os.path.exists(os.path.join(cfg.metrics_save_dir,
                                       "metrics_history.json"))


@pytest.mark.slow
def test_train_with_tracked_metrics_and_profile(tmp_path, monkeypatch):
    """VERDICT r1 items 4+6: metric-tracked eval against a val split runs
    during training (`Train.py:516-536,719-803`), checkpoints save through
    the async manager, and profile_steps captures a jax.profiler trace."""
    monkeypatch.setenv("ITSD_PIXEL_FEATURES", "1")
    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path)
    apply_overrides(cfg, [
        "train.track_metrics=true", "train.eval_freq=1",
        "train.metric_interval=4", "train.profile_steps=2",
        "data.val_ratio=0.25",
    ])
    out = runner.train(cfg, max_steps=4)
    assert np.isfinite(out["final_loss"])
    assert out["metrics_history"], "tracked eval should have run"
    hist = out["metrics_history"][0]["history"]
    assert all(np.isfinite(h[1]) for h in hist)  # FID points vs val split
    assert os.path.exists(os.path.join(
        cfg.metrics_save_dir, "metrics_history_epoch_0.json"))
    assert os.path.exists(os.path.join(
        cfg.metrics_save_dir, "metrics_curves_epoch_0.png"))
    trace_dir = os.path.join(cfg.metrics_save_dir, "trace")
    assert os.path.isdir(trace_dir) and os.listdir(trace_dir)
    # async-written checkpoints restore cleanly
    from itsd_tpu.train.checkpoint import restore_checkpoint
    restored = restore_checkpoint(out["checkpoints"][-1])
    assert restored.params is not None


@pytest.mark.slow
def test_run_search_cli_engages_candidate_sharding(tmp_path, capsys,
                                                   monkeypatch):
    """VERDICT r1 item 3: the search CLI builds the mesh itself and shards
    the candidate axis over every device (SURVEY §3.3), with results equal
    to the unsharded program."""
    from itsd_tpu.cli import runner
    cfg = _tiny_cfg(tmp_path)  # eval_batch_size=4, so 2 cands x 4 = 8 rows
    out = runner.train(cfg, max_steps=2)
    apply_overrides(cfg, ["search.algorithm=random",
                          "search.n_candidates=2",
                          "search.verifier=self_supervised"])
    res_sh = runner.run_search(cfg, params=out["state"].params)
    assert "[search] sharding 8 candidate rows over 8 devices" in \
        capsys.readouterr().out
    # force the unsharded path: identical keys -> identical result
    import itsd_tpu.parallel as par
    monkeypatch.setattr(par, "candidate_sharding",
                        lambda mesh, axis="data": None)
    res_un = runner.run_search(cfg, params=out["state"].params)
    np.testing.assert_allclose(res_sh["best_score"], res_un["best_score"],
                               rtol=1e-5, atol=1e-6)
