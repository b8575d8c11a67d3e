"""CLIP (ViT image tower + text tower) in JAX.

The reference uses OpenAI CLIP ViT-B/32 for the CLIP-similarity metric
(`/root/reference/utils/metrics.py:420-567`) and the supervised/CLIP
verifiers (`search/verifier.py:96-110,290-335`). This module implements the
CLIP architecture as pure JAX functions over a params pytree plus a
converter from a HuggingFace `transformers` CLIPModel state_dict — so any
locally available CLIP checkpoint gives numerically-matching features
(parity is tested against a random-initialised transformers CLIPModel in
tests/test_clip_port.py; no network needed).

Preprocessing matches OpenAI CLIP: bicubic resize to image_size + CLIP
mean/std normalisation. (Note the reference *verifier* skips CLIP
normalisation and feeds [0,1] pixels — a quirk, see verifier.py:127-139; use
`preprocess(..., normalize=False)` for bug-compatible scoring.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _layer_norm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _attention(p, x, causal_mask=None):
    """Standard MHA; p holds q/k/v/out projections, num_heads in meta."""
    B, N, D = x.shape
    H = p["num_heads"]
    hd = D // H
    q = _dense(p["q"], x).reshape(B, N, H, hd)
    k = _dense(p["k"], x).reshape(B, N, H, hd)
    v = _dense(p["v"], x).reshape(B, N, H, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        precision=jax.lax.Precision.HIGHEST) * (hd ** -0.5)
    if causal_mask is not None:
        scores = scores + causal_mask
    w = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                   precision=jax.lax.Precision.HIGHEST).reshape(B, N, D)
    return _dense(p["out"], o)


def _encoder_layer(p, x, causal_mask=None):
    x = x + _attention(p["attn"], _layer_norm(p["ln1"], x), causal_mask)
    h = _layer_norm(p["ln2"], x)
    h = _dense(p["fc2"], _quick_gelu(_dense(p["fc1"], h)))
    return x + h


def clip_image_features(params: Dict, images: jnp.ndarray,
                        projected: bool = True) -> jnp.ndarray:
    """images: [B, S, S, 3], already preprocessed. Returns [B, proj_dim]."""
    p = params["vision"]
    patch = p["patch_embedding"]  # HWIO conv kernel, no bias
    x = jax.lax.conv_general_dilated(
        images, patch, window_strides=(patch.shape[0], patch.shape[1]),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, hp, wp, D = x.shape
    x = x.reshape(B, hp * wp, D)
    cls = jnp.broadcast_to(p["class_embedding"], (B, 1, D))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["position_embedding"][None, : x.shape[1]]
    x = _layer_norm(p["pre_ln"], x)
    for layer in p["layers"]:
        x = _encoder_layer(layer, x)
    pooled = _layer_norm(p["post_ln"], x[:, 0])
    if projected and "visual_projection" in params:
        pooled = pooled @ params["visual_projection"]
    return pooled


def clip_text_features(params: Dict, token_ids: jnp.ndarray,
                       projected: bool = True) -> jnp.ndarray:
    """token_ids: [B, L] int32 (padded). Pooled at the argmax (EOT) token,
    matching HF/OpenAI CLIP."""
    p = params["text"]
    B, L = token_ids.shape
    x = jnp.take(p["token_embedding"], token_ids, axis=0)
    x = x + p["position_embedding"][None, :L]
    mask = jnp.triu(jnp.full((L, L), -jnp.inf), k=1)[None, None]
    for layer in p["layers"]:
        x = _encoder_layer(layer, x, causal_mask=mask)
    x = _layer_norm(p["final_ln"], x)
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = x[jnp.arange(B), eot]
    if projected and "text_projection" in params:
        pooled = pooled @ params["text_projection"]
    return pooled


def preprocess(images: jnp.ndarray, image_size: int = 224,
               normalize: bool = True) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> resized (+ CLIP-normalised). ``normalize=False``
    reproduces the reference verifier's skip-normalisation quirk."""
    B, H, W, C = images.shape
    if (H, W) != (image_size, image_size):
        images = jax.image.resize(images, (B, image_size, image_size, C),
                                  method="bicubic")
        images = jnp.clip(images, 0.0, 1.0)
    if normalize:
        images = (images - CLIP_MEAN) / CLIP_STD
    return images


# ---------------------------------------------------------------------------
# Conversion from HuggingFace transformers CLIPModel


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv_ln(sd, prefix):
    return {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _conv_dense(sd, prefix):
    return {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).T),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _conv_layers(sd, prefix, n_layers, n_heads):
    layers = []
    for i in range(n_layers):
        lp = f"{prefix}.layers.{i}"
        layers.append({
            "ln1": _conv_ln(sd, f"{lp}.layer_norm1"),
            "ln2": _conv_ln(sd, f"{lp}.layer_norm2"),
            "attn": {
                "num_heads": n_heads,
                "q": _conv_dense(sd, f"{lp}.self_attn.q_proj"),
                "k": _conv_dense(sd, f"{lp}.self_attn.k_proj"),
                "v": _conv_dense(sd, f"{lp}.self_attn.v_proj"),
                "out": _conv_dense(sd, f"{lp}.self_attn.out_proj"),
            },
            "fc1": _conv_dense(sd, f"{lp}.mlp.fc1"),
            "fc2": _conv_dense(sd, f"{lp}.mlp.fc2"),
        })
    return layers


def convert_transformers_clip(model_or_sd, vision_heads: Optional[int] = None,
                              text_heads: Optional[int] = None) -> Dict:
    """Convert a `transformers.CLIPModel` (or its state_dict + explicit head
    counts) into this module's params pytree."""
    if hasattr(model_or_sd, "state_dict"):
        cfg = model_or_sd.config
        vision_heads = cfg.vision_config.num_attention_heads
        text_heads = cfg.text_config.num_attention_heads
        sd = model_or_sd.state_dict()
    else:
        sd = model_or_sd
        assert vision_heads and text_heads, \
            "state_dict input needs explicit head counts"

    def count_layers(prefix):
        i = 0
        while f"{prefix}.layers.{i}.layer_norm1.weight" in sd:
            i += 1
        return i

    vm = "vision_model"
    if f"{vm}.embeddings.patch_embedding.weight" not in sd:
        vm = "text_model"  # vision-only absent: unlikely; keep simple
    n_v = count_layers(f"vision_model.encoder")
    n_t = count_layers(f"text_model.encoder")

    params: Dict[str, Any] = {}
    params["vision"] = {
        "patch_embedding": jnp.asarray(
            _np(sd["vision_model.embeddings.patch_embedding.weight"])
            .transpose(2, 3, 1, 0)),
        "class_embedding": jnp.asarray(
            _np(sd["vision_model.embeddings.class_embedding"])),
        "position_embedding": jnp.asarray(
            _np(sd["vision_model.embeddings.position_embedding.weight"])),
        "pre_ln": _conv_ln(sd, "vision_model.pre_layrnorm"),
        "post_ln": _conv_ln(sd, "vision_model.post_layernorm"),
        "layers": _conv_layers(sd, "vision_model.encoder", n_v, vision_heads),
    }
    params["text"] = {
        "token_embedding": jnp.asarray(
            _np(sd["text_model.embeddings.token_embedding.weight"])),
        "position_embedding": jnp.asarray(
            _np(sd["text_model.embeddings.position_embedding.weight"])),
        "final_ln": _conv_ln(sd, "text_model.final_layer_norm"),
        "layers": _conv_layers(sd, "text_model.encoder", n_t, text_heads),
    }
    if "visual_projection.weight" in sd:
        params["visual_projection"] = jnp.asarray(
            _np(sd["visual_projection.weight"]).T)
    if "text_projection.weight" in sd:
        params["text_projection"] = jnp.asarray(
            _np(sd["text_projection.weight"]).T)
    if "logit_scale" in sd:
        params["logit_scale"] = jnp.asarray(_np(sd["logit_scale"]))
    return params


def model_image_size(params: Dict) -> int:
    """Infer the vision tower's native input size from its weights."""
    p = params["vision"]
    patch = p["patch_embedding"].shape[0]
    n_patches = p["position_embedding"].shape[0] - 1
    side = int(round(float(n_patches) ** 0.5))
    return side * patch


def clip_similarity(params: Dict, images: jnp.ndarray,
                    token_ids: jnp.ndarray,
                    normalize_images: bool = True) -> jnp.ndarray:
    """Per-pair cosine similarity (diagonal), the reference's CLIPScore
    semantics (`utils/metrics.py:502-548`)."""
    img = clip_image_features(params, preprocess(
        images, image_size=model_image_size(params),
        normalize=normalize_images))
    txt = clip_text_features(params, token_ids)
    img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-8)
    txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-8)
    return jnp.sum(img * txt, axis=-1)
