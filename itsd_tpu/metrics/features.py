"""Feature-extractor registry for FID/IS/verifiers.

Priority:
1. Pretrained Inception-V3 (torchvision ``.pth`` at $ITSD_INCEPTION_WEIGHTS
   or an explicit path) — numerically matches the reference's FID
   (`utils/metrics.py:33-49`).
2. Deterministic random-weight Inception-V3 (same topology, fixed seed) —
   a documented proxy: FID values are not comparable to published numbers
   but are discriminative and stable, which is what search/verifier scoring
   needs (zero-egress environments cannot download weights).
3. Pooled-pixel features — cheapest fallback, used by the self-supervised
   verifier anyway (`search/verifier.py:207-221`).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .inception import (inception_v3, init_random_params,
                        load_torchvision_inception, preprocess)

FeatureFn = Callable[[jnp.ndarray], jnp.ndarray]

INCEPTION_ENV = "ITSD_INCEPTION_WEIGHTS"
CLIP_ENV = "ITSD_CLIP_WEIGHTS"


@functools.lru_cache(maxsize=2)
def _inception_params(weights_path: Optional[str]):
    if weights_path:
        return load_torchvision_inception(weights_path), "pretrained"
    return init_random_params(jax.random.PRNGKey(42)), "random"


def make_inception_extractors(
        weights_path: Optional[str] = None,
        batch_size: int = 64) -> Tuple[FeatureFn, FeatureFn, str]:
    """Returns (feature_fn [B,2048], logit_fn [B,1000], provenance).
    Inputs are [B,H,W,C] in [0,1]."""
    weights_path = weights_path or os.environ.get(INCEPTION_ENV) or None
    params, provenance = _inception_params(weights_path)
    if provenance == "random":
        import sys
        print("WARNING: FID/IS use a RANDOM-weight Inception-V3 (no "
              f"pretrained weights; set ${INCEPTION_ENV} to a torchvision "
              ".pth). Values are stable and ordering-discriminative but NOT "
              "comparable to published FID/IS numbers.", file=sys.stderr)

    @jax.jit
    def _run(x):
        return inception_v3(params, preprocess(x))

    def feature_fn(images):
        return _run(images)[0]

    def logit_fn(images):
        return _run(images)[1]

    return feature_fn, logit_fn, provenance


def pixel_feature_fn(pool_hw: int = 8) -> FeatureFn:
    """Pooled-pixel features — no weights needed."""
    from ..search.verifiers import adaptive_avg_pool

    def feature_fn(images):
        return adaptive_avg_pool(images, pool_hw).reshape(
            images.shape[0], -1)

    return feature_fn


def make_clip_feature_fn(weights_path: Optional[str] = None
                         ) -> Optional[FeatureFn]:
    """CLIP image-feature extractor for CLIP-tracked sampling
    (`/root/reference/Diffusion/Train.py:93-133`). Loads a HuggingFace
    CLIPModel state_dict ``.pt``/``.pth`` from `weights_path` or
    $ITSD_CLIP_WEIGHTS; returns None when no weights are available (the
    reference degrades to no-CLIP mode the same way, `Train.py:609-617`)."""
    weights_path = weights_path or os.environ.get(CLIP_ENV) or None
    if not weights_path:
        return None
    import torch

    from .clip import (clip_image_features, convert_transformers_clip,
                       model_image_size)
    from .clip import preprocess as clip_preprocess
    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    params = convert_transformers_clip(sd)
    size = model_image_size(params)

    @jax.jit
    def feature_fn(images):
        return clip_image_features(params, clip_preprocess(images, size))

    return feature_fn


def default_extractors(prefer_inception: bool = True):
    """Best-available (feature_fn, logit_fn, provenance). Set
    $ITSD_PIXEL_FEATURES=1 to force the cheap pixel extractor (tests)."""
    if os.environ.get("ITSD_PIXEL_FEATURES") == "1":
        prefer_inception = False
    if prefer_inception:
        try:
            return make_inception_extractors()
        except Exception:
            pass
    return pixel_feature_fn(), None, "pixel"
