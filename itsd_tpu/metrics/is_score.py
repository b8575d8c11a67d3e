"""Inception Score: IS = exp(E[KL(p(y|x) || p(y))]), with the reference's
10-split mean/std protocol (`/root/reference/utils/metrics.py:377-417`).

The classifier is pluggable: pass any ``logit_fn(images [B,H,W,C] in [0,1])
-> [B, num_classes]`` (the ported Inception-V3 from `metrics.inception`, or
any classifier for small-image datasets where Inception's 299x299 resize is
meaningless anyway).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def inception_score_from_probs(probs: np.ndarray,
                               splits: int = 10) -> Tuple[float, float]:
    """IS mean/std over `splits` chunks from precomputed p(y|x) [N, C]."""
    probs = np.asarray(probs, dtype=np.float64)
    n = len(probs)
    scores = []
    for i in range(splits):
        part = probs[i * n // splits:(i + 1) * n // splits]
        if len(part) == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-16) - np.log(py + 1e-16))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def inception_score(logit_fn, images, splits: int = 10,
                    batch_size: int = 64) -> Tuple[float, float]:
    """IS from images in [0,1]; logits are computed on-device in batches,
    softmaxed, and the splits protocol runs on host in float64."""
    n = images.shape[0]
    probs = []
    for i in range(0, n, batch_size):
        logits = logit_fn(images[i:i + batch_size])
        probs.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
    return inception_score_from_probs(np.concatenate(probs), splits)


def is_score_jax(probs: jnp.ndarray) -> jnp.ndarray:
    """Single-split IS on device (for use inside jitted verifiers)."""
    py = probs.mean(axis=0, keepdims=True)
    kl = probs * (jnp.log(probs + 1e-16) - jnp.log(py + 1e-16))
    return jnp.exp(kl.sum(axis=1).mean())
