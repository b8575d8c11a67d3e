"""Inception-V3 in JAX — evaluation-grade FID features + IS logits.

The reference computes FID from torchvision's pretrained Inception-V3 2048-d
pool features with the classifier head removed, and IS from its logits
(`/root/reference/utils/metrics.py:33-49,324-337`). Zero-egress environments
cannot download weights, so this module provides:

* the full torchvision Inception-V3 *topology* as pure JAX functions over a
  params pytree (inference only — BatchNorm uses stored running stats),
* a converter from a torchvision `state_dict` (a local ``.pth`` file or an
  in-memory dict of torch tensors) to that pytree — load once, FID matches
  the reference numerically,
* the exact preprocessing the reference uses: bilinear resize to 299 and
  ImageNet normalisation (`utils/metrics.py:61-87`).

When pretrained weights are not available, `metrics.features` falls back to
a documented proxy extractor; this module still validates end-to-end with
random weights (shape/topology tests).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


# ---------------------------------------------------------------------------
# Primitive layers (params are dicts; conv kernels stored HWIO)


def _conv(p: Dict, x: jnp.ndarray, stride: int = 1,
          padding="SAME") -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, p["kernel"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _basic_conv(p: Dict, x: jnp.ndarray, stride: int = 1,
                padding="SAME") -> jnp.ndarray:
    """Conv (no bias) -> BatchNorm(eps=1e-3, running stats) -> ReLU —
    torchvision's BasicConv2d."""
    x = _conv(p, x, stride, padding)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"] + 1e-3)
    x = (x - bn["mean"]) * inv * bn["scale"] + bn["bias"]
    return jax.nn.relu(x)


def _max_pool(x: jnp.ndarray, k: int = 3, s: int = 2) -> jnp.ndarray:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, 1), (1, s, s, 1), "VALID")


def _avg_pool_3x3_same(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 average pool with zero padding counted in the mean
    (torch F.avg_pool2d(count_include_pad=True), used in Inception blocks)."""
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                                   (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    return summed / 9.0


# ---------------------------------------------------------------------------
# Inception blocks (topology mirrors torchvision.models.inception)


def _inception_a(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b5 = _basic_conv(p["branch5x5_1"], x)
    b5 = _basic_conv(p["branch5x5_2"], b5)
    b3 = _basic_conv(p["branch3x3dbl_1"], x)
    b3 = _basic_conv(p["branch3x3dbl_2"], b3)
    b3 = _basic_conv(p["branch3x3dbl_3"], b3)
    bp = _basic_conv(p["branch_pool"], _avg_pool_3x3_same(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _inception_b(p, x):
    b3 = _basic_conv(p["branch3x3"], x, stride=2, padding="VALID")
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd)
    bd = _basic_conv(p["branch3x3dbl_3"], bd, stride=2, padding="VALID")
    bp = _max_pool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b7 = _basic_conv(p["branch7x7_1"], x)
    b7 = _basic_conv(p["branch7x7_2"], b7)
    b7 = _basic_conv(p["branch7x7_3"], b7)
    bd = _basic_conv(p["branch7x7dbl_1"], x)
    bd = _basic_conv(p["branch7x7dbl_2"], bd)
    bd = _basic_conv(p["branch7x7dbl_3"], bd)
    bd = _basic_conv(p["branch7x7dbl_4"], bd)
    bd = _basic_conv(p["branch7x7dbl_5"], bd)
    bp = _basic_conv(p["branch_pool"], _avg_pool_3x3_same(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(p, x):
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = _basic_conv(p["branch3x3_2"], b3, stride=2, padding="VALID")
    b7 = _basic_conv(p["branch7x7x3_1"], x)
    b7 = _basic_conv(p["branch7x7x3_2"], b7)
    b7 = _basic_conv(p["branch7x7x3_3"], b7)
    b7 = _basic_conv(p["branch7x7x3_4"], b7, stride=2, padding="VALID")
    bp = _max_pool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(p, x):
    b1 = _basic_conv(p["branch1x1"], x)
    b3 = _basic_conv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([_basic_conv(p["branch3x3_2a"], b3),
                          _basic_conv(p["branch3x3_2b"], b3)], axis=-1)
    bd = _basic_conv(p["branch3x3dbl_1"], x)
    bd = _basic_conv(p["branch3x3dbl_2"], bd)
    bd = jnp.concatenate([_basic_conv(p["branch3x3dbl_3a"], bd),
                          _basic_conv(p["branch3x3dbl_3b"], bd)], axis=-1)
    bp = _basic_conv(p["branch_pool"], _avg_pool_3x3_same(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def inception_v3(params: Dict, x: jnp.ndarray,
                 return_logits: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass. ``x``: [B, 299, 299, 3] already ImageNet-normalised.

    Returns (pool_features [B, 2048], logits [B, 1000] or None).
    """
    x = _basic_conv(params["Conv2d_1a_3x3"], x, stride=2, padding="VALID")
    x = _basic_conv(params["Conv2d_2a_3x3"], x, padding="VALID")
    x = _basic_conv(params["Conv2d_2b_3x3"], x)
    x = _max_pool(x)
    x = _basic_conv(params["Conv2d_3b_1x1"], x)
    x = _basic_conv(params["Conv2d_4a_3x3"], x, padding="VALID")
    x = _max_pool(x)
    x = _inception_a(params["Mixed_5b"], x)
    x = _inception_a(params["Mixed_5c"], x)
    x = _inception_a(params["Mixed_5d"], x)
    x = _inception_b(params["Mixed_6a"], x)
    x = _inception_c(params["Mixed_6b"], x)
    x = _inception_c(params["Mixed_6c"], x)
    x = _inception_c(params["Mixed_6d"], x)
    x = _inception_c(params["Mixed_6e"], x)
    x = _inception_d(params["Mixed_7a"], x)
    x = _inception_e(params["Mixed_7b"], x)
    x = _inception_e(params["Mixed_7c"], x)
    feats = x.mean(axis=(1, 2))  # global average pool -> [B, 2048]
    logits = None
    if return_logits and "fc" in params:
        logits = feats @ params["fc"]["kernel"] + params["fc"]["bias"]
    return feats, logits


def preprocess(images: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] in [0,1] -> bilinear 299x299 + ImageNet normalise, matching
    `utils/metrics.py:61-87`."""
    B, H, W, C = images.shape
    if (H, W) != (299, 299):
        images = jax.image.resize(images, (B, 299, 299, C), method="bilinear")
    return (images - IMAGENET_MEAN) / IMAGENET_STD


# ---------------------------------------------------------------------------
# Weight conversion from a torchvision state_dict


# Inception module class per Mixed block (determines branch layout).
_BLOCK_KIND = {
    "Mixed_5b": "a", "Mixed_5c": "a", "Mixed_5d": "a",
    "Mixed_6a": "b",
    "Mixed_6b": "c", "Mixed_6c": "c", "Mixed_6d": "c", "Mixed_6e": "c",
    "Mixed_7a": "d",
    "Mixed_7b": "e", "Mixed_7c": "e",
}

_STEM = ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3",
         "Conv2d_3b_1x1", "Conv2d_4a_3x3"]


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _convert_basic_conv(sd: Dict, prefix: str) -> Dict:
    # torch conv weight OIHW -> HWIO
    w = _np(sd[f"{prefix}.conv.weight"]).transpose(2, 3, 1, 0)
    return {
        "kernel": jnp.asarray(w),
        "bn": {
            "scale": jnp.asarray(_np(sd[f"{prefix}.bn.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bn.bias"])),
            "mean": jnp.asarray(_np(sd[f"{prefix}.bn.running_mean"])),
            "var": jnp.asarray(_np(sd[f"{prefix}.bn.running_var"])),
        },
    }


_BRANCHES = {
    "a": ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
          "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"],
    "b": ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"],
    "c": ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
          "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
          "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"],
    "d": ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2",
          "branch7x7x3_3", "branch7x7x3_4"],
    "e": ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
          "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
          "branch3x3dbl_3b", "branch_pool"],
}


def convert_torchvision_state_dict(sd: Dict[str, Any],
                                   include_fc: bool = True) -> Dict:
    """torchvision `inception_v3` state_dict -> JAX params pytree. Aux
    branch is dropped (the reference removes it too, `metrics.py:41`)."""
    params: Dict[str, Any] = {}
    for name in _STEM:
        params[name] = _convert_basic_conv(sd, name)
    for block, kind in _BLOCK_KIND.items():
        params[block] = {b: _convert_basic_conv(sd, f"{block}.{b}")
                         for b in _BRANCHES[kind]}
    if include_fc and "fc.weight" in sd:
        params["fc"] = {
            "kernel": jnp.asarray(_np(sd["fc.weight"]).T),
            "bias": jnp.asarray(_np(sd["fc.bias"])),
        }
    return params


def load_torchvision_inception(path: str, include_fc: bool = True) -> Dict:
    """Load a torchvision inception_v3 ``.pth`` checkpoint file."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_torchvision_state_dict(sd, include_fc=include_fc)


# ---------------------------------------------------------------------------
# Random initialisation (for tests / topology validation)


def init_random_params(key, include_fc: bool = True) -> Dict:
    """Random-weight params with the exact production shapes — used by the
    topology tests and as a deterministic fallback extractor."""
    specs = _inception_conv_specs()
    params: Dict[str, Any] = {}
    keys = jax.random.split(key, len(specs) + 1)
    for (path, (kh, kw, cin, cout)), k in zip(specs.items(), keys[:-1]):
        node = params
        parts = path.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = {
            "kernel": jax.random.normal(k, (kh, kw, cin, cout)) *
            (2.0 / (kh * kw * cin)) ** 0.5,
            "bn": {"scale": jnp.ones(cout), "bias": jnp.zeros(cout),
                   "mean": jnp.zeros(cout), "var": jnp.ones(cout)},
        }
    if include_fc:
        params["fc"] = {
            "kernel": jax.random.normal(keys[-1], (2048, 1000)) * 0.01,
            "bias": jnp.zeros(1000),
        }
    return params


def _inception_conv_specs() -> Dict[str, Tuple[int, int, int, int]]:
    """(kh, kw, cin, cout) for every BasicConv2d, keyed by dotted path."""
    s: Dict[str, Tuple[int, int, int, int]] = {
        "Conv2d_1a_3x3": (3, 3, 3, 32),
        "Conv2d_2a_3x3": (3, 3, 32, 32),
        "Conv2d_2b_3x3": (3, 3, 32, 64),
        "Conv2d_3b_1x1": (1, 1, 64, 80),
        "Conv2d_4a_3x3": (3, 3, 80, 192),
    }

    def add_a(name, cin, pool):
        s[f"{name}.branch1x1"] = (1, 1, cin, 64)
        s[f"{name}.branch5x5_1"] = (1, 1, cin, 48)
        s[f"{name}.branch5x5_2"] = (5, 5, 48, 64)
        s[f"{name}.branch3x3dbl_1"] = (1, 1, cin, 64)
        s[f"{name}.branch3x3dbl_2"] = (3, 3, 64, 96)
        s[f"{name}.branch3x3dbl_3"] = (3, 3, 96, 96)
        s[f"{name}.branch_pool"] = (1, 1, cin, pool)
        return 64 + 64 + 96 + pool

    def add_b(name, cin):
        s[f"{name}.branch3x3"] = (3, 3, cin, 384)
        s[f"{name}.branch3x3dbl_1"] = (1, 1, cin, 64)
        s[f"{name}.branch3x3dbl_2"] = (3, 3, 64, 96)
        s[f"{name}.branch3x3dbl_3"] = (3, 3, 96, 96)
        return 384 + 96 + cin

    def add_c(name, cin, c7):
        s[f"{name}.branch1x1"] = (1, 1, cin, 192)
        s[f"{name}.branch7x7_1"] = (1, 1, cin, c7)
        s[f"{name}.branch7x7_2"] = (1, 7, c7, c7)
        s[f"{name}.branch7x7_3"] = (7, 1, c7, 192)
        s[f"{name}.branch7x7dbl_1"] = (1, 1, cin, c7)
        s[f"{name}.branch7x7dbl_2"] = (7, 1, c7, c7)
        s[f"{name}.branch7x7dbl_3"] = (1, 7, c7, c7)
        s[f"{name}.branch7x7dbl_4"] = (7, 1, c7, c7)
        s[f"{name}.branch7x7dbl_5"] = (1, 7, c7, 192)
        s[f"{name}.branch_pool"] = (1, 1, cin, 192)
        return 192 * 4

    def add_d(name, cin):
        s[f"{name}.branch3x3_1"] = (1, 1, cin, 192)
        s[f"{name}.branch3x3_2"] = (3, 3, 192, 320)
        s[f"{name}.branch7x7x3_1"] = (1, 1, cin, 192)
        s[f"{name}.branch7x7x3_2"] = (1, 7, 192, 192)
        s[f"{name}.branch7x7x3_3"] = (7, 1, 192, 192)
        s[f"{name}.branch7x7x3_4"] = (3, 3, 192, 192)
        return 320 + 192 + cin

    def add_e(name, cin):
        s[f"{name}.branch1x1"] = (1, 1, cin, 320)
        s[f"{name}.branch3x3_1"] = (1, 1, cin, 384)
        s[f"{name}.branch3x3_2a"] = (1, 3, 384, 384)
        s[f"{name}.branch3x3_2b"] = (3, 1, 384, 384)
        s[f"{name}.branch3x3dbl_1"] = (1, 1, cin, 448)
        s[f"{name}.branch3x3dbl_2"] = (3, 3, 448, 384)
        s[f"{name}.branch3x3dbl_3a"] = (1, 3, 384, 384)
        s[f"{name}.branch3x3dbl_3b"] = (3, 1, 384, 384)
        s[f"{name}.branch_pool"] = (1, 1, cin, 192)
        return 320 + 768 + 768 + 192

    c = add_a("Mixed_5b", 192, 32)
    c = add_a("Mixed_5c", c, 64)
    c = add_a("Mixed_5d", c, 64)
    c = add_b("Mixed_6a", c)
    c = add_c("Mixed_6b", c, 128)
    c = add_c("Mixed_6c", c, 160)
    c = add_c("Mixed_6d", c, 160)
    c = add_c("Mixed_6e", c, 192)
    c = add_d("Mixed_7a", c)
    c = add_e("Mixed_7b", c)
    c = add_e("Mixed_7c", c)
    assert c == 2048, c
    return s
