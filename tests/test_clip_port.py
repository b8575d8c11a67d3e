"""CLIP port: numerical parity with transformers CLIPModel (random weights —
no network needed)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_clip():
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig, \
        CLIPVisionConfig
    cfg = CLIPConfig(
        # eos_token_id=99 and sequences ending in 99 make HF's eos-pooling
        # coincide with OpenAI CLIP's argmax(ids) pooling (which we
        # implement), regardless of transformers' legacy/new branch.
        text_config=CLIPTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16,
            vocab_size=100, eos_token_id=99).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8).to_dict(),
        projection_dim=16,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model


def test_image_features_match_transformers(tiny_clip):
    from itsd_tpu.metrics.clip import (clip_image_features,
                                       convert_transformers_clip)
    params = convert_transformers_clip(tiny_clip)
    x = torch.randn(3, 3, 32, 32)
    with torch.no_grad():
        want = tiny_clip.get_image_features(pixel_values=x).numpy()
    got = np.asarray(clip_image_features(
        params, jnp.asarray(x.permute(0, 2, 3, 1).numpy())))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_text_features_match_transformers(tiny_clip):
    from itsd_tpu.metrics.clip import (clip_text_features,
                                       convert_transformers_clip)
    params = convert_transformers_clip(tiny_clip)
    ids = torch.tensor([[1, 5, 9, 99, 0, 0], [1, 7, 99, 0, 0, 0]])
    attn = (ids != 0).long()
    with torch.no_grad():
        want = tiny_clip.get_text_features(input_ids=ids,
                                           attention_mask=attn).numpy()
    got = np.asarray(clip_text_features(params, jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_clip_similarity_range(tiny_clip):
    from itsd_tpu.metrics.clip import clip_similarity, \
        convert_transformers_clip
    params = convert_transformers_clip(tiny_clip)
    imgs = jnp.clip(jnp.ones((2, 16, 16, 3)) * 0.5, 0, 1)
    ids = jnp.asarray([[1, 5, 99, 0], [1, 7, 99, 0]])
    sims = clip_similarity(params, imgs, ids)
    assert sims.shape == (2,)
    assert np.all(np.abs(np.asarray(sims)) <= 1.0 + 1e-5)
