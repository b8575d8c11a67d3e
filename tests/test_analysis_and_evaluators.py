"""Representation-analysis CLI and class-style metric evaluators."""

import os

import numpy as np
import pytest


def _write_reprs(tmp_path, epochs=(0, 1)):
    rng = np.random.default_rng(0)
    d = tmp_path / "representations"
    d.mkdir()
    for e in epochs:
        np.savez(d / f"epoch_{e}.npz",
                 representations=rng.normal(
                     size=(40, 16)).astype(np.float32) + e,
                 labels=rng.integers(0, 10, size=40).astype(np.int32))
    return str(d)


def test_load_and_stats(tmp_path):
    from itsd_tpu.cli.analyze import load_representations, \
        representation_stats
    d = _write_reprs(tmp_path)
    per_epoch = load_representations(d)
    assert sorted(per_epoch) == [0, 1]
    reps, labels = per_epoch[0]
    st = representation_stats(reps, labels)
    assert st["n"] == 40 and st["dim"] == 16
    assert len(st["label_histogram"]) <= 10


def test_analyze_cli_end_to_end(tmp_path):
    from itsd_tpu.cli.analyze import main
    d = _write_reprs(tmp_path)
    out = tmp_path / "analysis"
    rc = main(["--repr-dir", d, "--out-dir", str(out),
               "--perplexity", "5"])
    assert rc == 0
    assert (out / "tsne_epoch_1.png").exists()
    assert (out / "representation_evolution.png").exists()


@pytest.mark.slow
def test_fid_evaluator_class():
    """FID class with the pixel-feature fallback: identical batches -> ~0,
    shifted batches -> larger."""
    from itsd_tpu.metrics import FID
    fid = FID()  # no weights -> proxy extractor
    rng = np.random.default_rng(1)
    real = rng.uniform(0, 1, (64, 16, 16, 3)).astype(np.float32)
    fake_near = rng.uniform(0, 1, (64, 16, 16, 3)).astype(np.float32)
    fake_far = np.clip(fake_near + 0.4, 0, 1)
    near = fid(real, fake_near)
    far = fid(real, fake_far)
    assert near < far


def test_clip_score_evaluator_class():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, \
        CLIPVisionConfig
    from itsd_tpu.metrics import CLIPScore
    from itsd_tpu.metrics.clip import convert_transformers_clip

    cfg = CLIPConfig(
        text_config=CLIPTextConfig(hidden_size=32, intermediate_size=64,
                                   num_hidden_layers=1,
                                   num_attention_heads=2,
                                   max_position_embeddings=8,
                                   vocab_size=50).to_dict(),
        vision_config=CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                                       num_hidden_layers=1,
                                       num_attention_heads=2, image_size=16,
                                       patch_size=8).to_dict(),
        projection_dim=8)
    torch.manual_seed(0)
    params = convert_transformers_clip(CLIPModel(cfg).eval())
    cs = CLIPScore(params, batch_size=8)
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (6, 16, 16, 3)).astype(np.float32)
    feats = cs.get_features(imgs)
    assert feats.shape == (6, 8)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               rtol=1e-4)
    # similarity of a set with itself is higher than with shifted images
    sim_self = cs.similarity(imgs, feats)
    sim_other = cs.similarity(np.clip(1 - imgs, 0, 1), feats)
    assert sim_self >= sim_other - 1e-6
    div = cs.diversity(imgs)
    assert -1.0 <= div <= 2.0

def test_fid_path_based_extraction(tmp_path):
    """Path-based feature entry (`utils/metrics.py:89-133`): features from
    PNGs on disk match features from the same arrays in memory."""
    from PIL import Image

    from itsd_tpu.metrics import FID, load_images
    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 1, (6, 16, 16, 3)).astype(np.float32)
    paths = []
    for i, a in enumerate(imgs):
        p = tmp_path / f"im_{i}.png"
        Image.fromarray((a * 255).astype(np.uint8)).save(p)
        paths.append(str(p))

    loaded = load_images(paths)
    assert loaded.shape == imgs.shape
    np.testing.assert_allclose(loaded, imgs, atol=1 / 255 + 1e-6)

    fid = FID()
    f_mem = fid.get_features(loaded)
    f_path = fid.extract_features(paths)
    np.testing.assert_allclose(f_mem, f_path)
    # resize path
    small = load_images(paths, size=8)
    assert small.shape == (6, 8, 8, 3)
