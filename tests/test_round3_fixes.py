"""Round-3 hardening: de-synced gradient search, clip_denoised bounding,
CLI verifier registry (classifier/ensemble), process-local batch feed,
track_metrics auto default, chunked-search seeding."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from itsd_tpu.core import linear_schedule, sample
from itsd_tpu.search import gradient_search

SCHED = linear_schedule(1e-4, 0.02, 8)
SHAPE = (2, 4, 4, 3)
TARGET = jax.random.normal(jax.random.PRNGKey(99), SHAPE)


def _zero_eps(x, t):
    return jnp.zeros_like(x)


def _target_verifier(images):
    return -jnp.mean((images - jnp.clip(TARGET, -1, 1)) ** 2)


# ---------------------------------------------------------------------------
# gradient_search: one jittable program, zero per-iteration host syncs


def test_gradient_search_is_one_jitted_program(key):
    """The whole search must trace under jit — a host-side float() in the
    loop (the old per-iteration sync) would raise a ConcretizationTypeError
    here."""
    @jax.jit
    def run(k, init):
        r = gradient_search(k, init, SCHED, _zero_eps, _target_verifier,
                            n_iterations=3, lr=0.05)
        return r.best_score, r.best_noise, r.history["scores"]

    init = jax.random.normal(jax.random.fold_in(key, 1), SHAPE)
    best, noise, scores = run(key, init)
    assert scores.shape == (3,)
    assert np.isfinite(float(best))
    # best tracking matches the score history
    assert float(best) == pytest.approx(float(np.max(np.asarray(scores))),
                                        rel=1e-5)


def test_gradient_search_improves(key):
    init = jax.random.normal(jax.random.fold_in(key, 2), SHAPE)
    r = gradient_search(key, init, SCHED, _zero_eps, _target_verifier,
                        n_iterations=10, lr=0.05)
    scores = np.asarray(r.history["scores"])
    assert scores[-1] > scores[0]


def test_gradient_search_nan_scores_never_win(key):
    """A verifier returning NaN on some iterations must not poison the best
    score (jnp.maximum would propagate the NaN)."""
    calls = jnp.array([0])

    def sometimes_nan_verifier(images):
        s = _target_verifier(images)
        # NaN on iterations where the mean pixel is below a threshold —
        # deterministic but input-dependent, so it traces
        return jnp.where(jnp.mean(images) > 1e6, s, jnp.nan)

    init = jax.random.normal(jax.random.fold_in(key, 3), SHAPE)
    r = gradient_search(key, init, SCHED, _zero_eps, sometimes_nan_verifier,
                        n_iterations=3, lr=0.05)
    # every score is NaN here, so best must be -inf, never NaN
    assert not np.isnan(float(r.best_score))


# ---------------------------------------------------------------------------
# clip_denoised bounds long extrapolative chains


def test_clip_denoised_bounds_diverging_chain(key):
    """An eps model that anti-correlates with x makes each ancestral step a
    gain >1, so the unclipped chain explodes over enough steps; clip_x0
    keeps it bounded (the T=3000 CFG-w=1.8 failure mode in miniature)."""
    sched = linear_schedule(1e-4, 0.02, 200)

    def bad_eps(x, t):  # strongly wrong prediction, amplifies the state
        return -3.0 * x

    x_T = jax.random.normal(key, (2, 4, 4, 3))
    raw = sample(sched, bad_eps, x_T, key, clip_output=False)
    clipped = sample(sched, bad_eps, x_T, key, clip_output=False,
                     clip_denoised=True)
    raw_mag = float(jnp.max(jnp.abs(raw)))
    clip_mag = float(jnp.max(jnp.abs(clipped)))
    assert raw_mag > 1e4 or not np.isfinite(raw_mag)  # genuinely diverges
    assert np.isfinite(clip_mag) and clip_mag < 50.0


def test_clip_denoised_noop_for_accurate_model(key):
    """With eps-hat whose implied x0 is already inside [-1,1], clipping
    changes nothing — the parity-tested unclipped semantics survive."""
    from itsd_tpu.core.process import p_sample_step

    sched = linear_schedule(1e-4, 0.02, 16)
    x0 = jnp.tanh(jax.random.normal(key, (2, 4, 4, 3)))  # in (-1,1)
    t = jnp.full((2,), 7, jnp.int32)
    noise = jax.random.normal(jax.random.fold_in(key, 1), x0.shape)
    from itsd_tpu.core.process import q_sample
    eps = jax.random.normal(jax.random.fold_in(key, 2), x0.shape)
    x_t = q_sample(sched, x0, t, eps)
    step_noise = jax.random.normal(jax.random.fold_in(key, 3), x0.shape)
    a = p_sample_step(sched, x_t, t, eps, step_noise)
    b = p_sample_step(sched, x_t, t, eps, step_noise, clip_x0=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# ---------------------------------------------------------------------------
# classifier checkpoint roundtrip + CLI verifier registry


def test_classifier_save_load_roundtrip(tmp_path, rng):
    from itsd_tpu.models import (ClassifierConfig, SmallCNN, load_classifier,
                                 save_classifier, train_classifier)

    imgs = rng.normal(size=(64, 8, 8, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=(64,))
    _, params, _ = train_classifier(
        imgs, labels, ClassifierConfig(num_classes=4, ch=8, depth=2),
        epochs=1, batch_size=32)
    path = str(tmp_path / "clf")
    save_classifier(path, params)
    logit_fn, params2, cfg = load_classifier(path)
    assert cfg.num_classes == 4 and cfg.ch == 8 and cfg.depth == 2
    x = jnp.asarray((imgs[:4] + 1) / 2)
    model = SmallCNN(cfg)
    np.testing.assert_allclose(np.asarray(logit_fn(x)),
                               np.asarray(model.apply(params, x)), atol=1e-6)


def test_cli_classifier_verifier(tmp_path, rng):
    from itsd_tpu.cli.runner import build_cli_verifier
    from itsd_tpu.models import ClassifierConfig, save_classifier, \
        train_classifier
    from itsd_tpu.utils import load_config

    imgs = rng.normal(size=(64, 8, 8, 3)).astype(np.float32)
    labels = rng.integers(0, 4, size=(64,))
    _, params, _ = train_classifier(
        imgs, labels, ClassifierConfig(num_classes=4, ch=8, depth=2),
        epochs=1, batch_size=32)
    save_classifier(str(tmp_path / "clf"), params)

    cfg = load_config(overrides=[
        "search.verifier=classifier", "search.classifier_ckpt=clf",
        "search.target_label=2", f"save_weight_dir={tmp_path}"])
    v = build_cli_verifier(cfg, conditional=False, eval_bs=4)
    score = v(jnp.asarray(imgs[:4]))
    assert np.isfinite(float(score))
    # log-probabilities: must be <= 0
    assert float(score) <= 0.0

    # missing ckpt -> actionable error
    cfg2 = load_config(overrides=["search.verifier=classifier"])
    with pytest.raises(ValueError, match="classifier_ckpt"):
        build_cli_verifier(cfg2, conditional=False, eval_bs=4)


def test_cli_ensemble_verifier():
    from itsd_tpu.cli.runner import build_cli_verifier
    from itsd_tpu.utils import load_config

    cfg = load_config(overrides=[
        "search.verifier=ensemble", "search.ensemble_num_real=4",
        "data.dataset=synthetic", "data.img_size=8",
        "train.batch_size=4"])
    v = build_cli_verifier(cfg, conditional=False, eval_bs=2)
    imgs = jnp.tanh(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3)))
    s = float(v(imgs))
    assert np.isfinite(s)


def test_cli_unknown_verifier_errors():
    from itsd_tpu.cli.runner import build_cli_verifier
    from itsd_tpu.utils import load_config

    cfg = load_config(overrides=["search.verifier=nope"])
    with pytest.raises(ValueError, match="unknown search.verifier"):
        build_cli_verifier(cfg, conditional=False, eval_bs=4)


# ---------------------------------------------------------------------------
# multi-host feed path + mesh


def test_shard_batch_process_local():
    from itsd_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(axis_names=("data",))
    x = np.arange(8 * 2 * 2, dtype=np.float32).reshape(8, 2, 2)
    out = shard_batch({"image": x}, mesh, process_local=True)
    # single process: global == local, values preserved, sharded over data
    np.testing.assert_array_equal(np.asarray(out["image"]), x)
    assert len(out["image"].sharding.device_set) == len(jax.devices())


def test_maybe_initialize_distributed_noop():
    from itsd_tpu.parallel import maybe_initialize_distributed

    assert os.environ.get("ITSD_MULTIHOST") != "1"
    assert maybe_initialize_distributed() is False


# ---------------------------------------------------------------------------
# track_metrics auto default


def test_track_metrics_auto_default():
    from itsd_tpu.cli.runner import resolve_track_metrics
    from itsd_tpu.utils import Config, load_config

    assert Config().train.track_metrics is None
    cfg = load_config(overrides=["data.dataset=synthetic"])
    assert resolve_track_metrics(cfg) is False
    cfg = load_config(overrides=["data.dataset=shapes"])
    assert resolve_track_metrics(cfg) is True
    cfg = load_config(overrides=["data.dataset=cifar10",
                                 "train.track_metrics=false"])
    assert resolve_track_metrics(cfg) is False


# ---------------------------------------------------------------------------
# chunked random search: single-chunk run preserves the unchunked seed path


def test_single_chunk_seeding_matches_unchunked(tmp_path):
    from itsd_tpu.cli.runner import run_search
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.utils import load_config

    ucfg = uncond_unet_config(ch=8, ch_mult=(1,), attn=(), num_res_blocks=1,
                              dropout=0.0, T=8)
    model = UNet(ucfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 8, 8, 3)), jnp.zeros((2,), jnp.int32))

    base = ["model.channel=8", "model.channel_mult=[1]", "model.attn=[]",
            "model.num_res_blocks=1", "model.dropout=0.0", "diffusion.T=8",
            "data.img_size=8", "train.eval_batch_size=2",
            "search.algorithm=random", "search.n_candidates=4",
            "search.verifier=self_supervised",
            f"sampled_dir={tmp_path}"]
    out_a = run_search(load_config(overrides=base), params=params)
    out_b = run_search(load_config(overrides=base + [
        "search.candidate_chunk=4"]), params=params)
    assert out_a["best_score"] == pytest.approx(out_b["best_score"],
                                                rel=1e-6)


# ---------------------------------------------------------------------------
# verifier-hacking guard (paper's failure mode as a product check)


def test_search_guard_proxy_fields_and_flagging(tmp_path):
    from itsd_tpu.cli.runner import run_search
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.utils import load_config

    ucfg = uncond_unet_config(ch=8, ch_mult=(1,), attn=(), num_res_blocks=1,
                              dropout=0.0, T=8)
    model = UNet(ucfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 8, 8, 3)), jnp.zeros((2,), jnp.int32))

    base = ["model.channel=8", "model.channel_mult=[1]", "model.attn=[]",
            "model.num_res_blocks=1", "model.dropout=0.0", "diffusion.T=8",
            "data.dataset=synthetic", "data.img_size=8",
            "train.eval_batch_size=2",
            "search.algorithm=random", "search.n_candidates=2",
            "search.verifier=self_supervised", "search.guard_proxy=true",
            "search.guard_num_real=32",
            f"sampled_dir={tmp_path}"]
    out = run_search(load_config(overrides=base), params=params)
    g = out["guard"]
    assert g is not None
    assert np.isfinite(g["winner_fid_proxy"])
    assert np.isfinite(g["baseline_fid_proxy"])
    assert isinstance(g["flagged"], bool)

    # deterministic decision-logic checks: flagged iff
    # winner_proxy > ratio * baseline_proxy. A near-zero ratio must trip
    # (any positive winner proxy exceeds it); a huge ratio must not.
    out2 = run_search(
        load_config(overrides=base + ["search.guard_ratio=1e-9"]),
        params=params,
        verifier_fn=lambda imgs: jnp.mean(imgs))
    assert out2["guard"]["winner_fid_proxy"] > 0
    assert out2["guard"]["flagged"] is True
    out2b = run_search(
        load_config(overrides=base + ["search.guard_ratio=1e9"]),
        params=params)
    assert out2b["guard"]["flagged"] is False

    # guard off -> no guard dict
    out3 = run_search(load_config(overrides=base[:-3] +
                                  [f"sampled_dir={tmp_path}"]),
                      params=params)
    assert out3["guard"] is None
