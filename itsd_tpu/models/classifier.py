"""Compact convolutional classifier — the trainable companion for
`search.verifiers.classifier_verifier` (BASELINE.md workload 3: best-of-N
noise search scored by per-class log-probability on CIFAR-10).

The reference has no classifier of its own (its supervised verifier leans on
CLIP, `search/verifier.py:69-110`); a small in-framework CNN lets the
classifier-verifier workload run self-contained with no external weights.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .embeddings import xavier, zeros


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    num_classes: int = 10
    ch: int = 32
    depth: int = 3          # number of conv stages (stride-2 each)
    dtype: str = "float32"


class SmallCNN(nn.Module):
    """conv-swish x2 per stage with stride-2 downsampling, GAP head.
    Input: [B, H, W, C] in [0, 1]."""
    cfg: ClassifierConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 return_features: bool = False):
        dtype = jnp.dtype(self.cfg.dtype)
        x = x.astype(dtype) * 2.0 - 1.0
        ch = self.cfg.ch
        for i in range(self.cfg.depth):
            x = nn.Conv(ch, (3, 3), kernel_init=xavier, bias_init=zeros,
                        dtype=dtype, name=f"conv{i}a")(x)
            x = nn.silu(x)
            x = nn.Conv(ch, (3, 3), strides=(2, 2), kernel_init=xavier,
                        bias_init=zeros, dtype=dtype, name=f"conv{i}b")(x)
            x = nn.silu(x)
            ch *= 2
        # GAP penultimate = the classifier's feature embedding (usable as a
        # dataset-specific FID-proxy feature space, cf. Inception pool3)
        feats = x.mean(axis=(1, 2)).astype(jnp.float32)
        x = nn.Dense(self.cfg.num_classes, kernel_init=xavier,
                     bias_init=zeros, dtype=dtype, name="head")(
                         feats.astype(dtype))
        logits = x.astype(jnp.float32)
        if return_features:
            return logits, feats
        return logits


def train_classifier(images, labels, cfg: ClassifierConfig = None,
                     epochs: int = 5, batch_size: int = 128,
                     lr: float = 1e-3, seed: int = 0):
    """Train SmallCNN on (images [N,H,W,C] in [-1,1] or [0,1], labels [N]).
    Returns (logit_fn, params, final_accuracy).

    TPU-shaped: the whole dataset is device-resident and every step of every
    epoch runs inside ONE `lax.scan` launch (steps gather their batch by
    index on device) — a per-step Python loop would pay a host->TPU relay
    round-trip per step, which dominates at this model size."""
    import numpy as np

    cfg = cfg or ClassifierConfig()
    model = SmallCNN(cfg)
    images = np.asarray(images, dtype=np.float32)
    if images.min() < -0.01:
        images = (images + 1.0) / 2.0
    labels = np.asarray(labels, dtype=np.int32)

    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((2,) + images.shape[1:]))
    tx = optax.adamw(lr)

    rng = np.random.default_rng(seed)
    n = len(images)
    # datasets smaller than one batch still train (the pre-scan loop
    # silently ran zero steps here; unclamped, the reshape below crashes)
    batch_size = min(batch_size, n)
    nb = max(1, n // batch_size)
    idx = np.stack([rng.permutation(n)[:nb * batch_size].reshape(
        nb, batch_size) for _ in range(epochs)]).reshape(-1, batch_size)

    # the dataset is an ARGUMENT of the jitted fit, not a closure capture —
    # closed-over arrays would be inlined as HLO constants (hundreds of MB
    # in the compile payload); uploaded in relay-bounded pieces
    from ..utils.transfer import chunked_device_put
    x_dev = chunked_device_put(images)
    y_dev = jax.device_put(labels)

    @jax.jit
    def fit(params, xs, ys, idx):
        def step(carry, batch_idx):
            params, opt_state = carry
            x = jnp.take(xs, batch_idx, axis=0)
            y = jnp.take(ys, batch_idx, axis=0)

            def loss_fn(p):
                logits = model.apply(p, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, _), losses = jax.lax.scan(
            step, (params, tx.init(params)), idx)
        return params, losses

    params, _ = fit(params, x_dev, y_dev, jnp.asarray(idx, jnp.int32))

    @jax.jit
    def logit_fn(x):
        return model.apply(params, x)

    preds = np.asarray(jnp.argmax(logit_fn(x_dev[:512]), -1))
    acc = float((preds == labels[:512]).mean())
    return logit_fn, params, acc


def save_classifier(path: str, params) -> None:
    """Weights-only checkpoint a CLI search can load
    (`search.verifier=classifier search.classifier_ckpt=...`)."""
    import jax as _jax

    from ..train.checkpoint import save_params
    save_params(path, _jax.device_get(params))


def load_classifier(path: str):
    """Restore a SmallCNN checkpoint, inferring its architecture from the
    parameter shapes (num_classes from the head, ch from conv0a, depth from
    the conv-stage count). Returns (logit_fn, params, cfg)."""
    from ..train.checkpoint import restore_params

    params = restore_params(path, template=None)
    p = params["params"]
    depth = sum(1 for k in p if k.startswith("conv") and k.endswith("a"))
    cfg = ClassifierConfig(
        num_classes=int(p["head"]["kernel"].shape[-1]),
        ch=int(p["conv0a"]["kernel"].shape[-1]),
        depth=depth)
    model = SmallCNN(cfg)

    def logit_fn(x):
        return model.apply(params, x)

    return logit_fn, params, cfg


def load_classifier_extractors(path: str):
    """(feature_fn, logit_fn, provenance) from a SmallCNN checkpoint, for
    the tracked-metrics pipeline: logits feed Inception-Score-style
    tracking, the GAP penultimate feeds a dataset-specific FID-proxy.

    A TRAINED in-domain classifier gives tracked IS real signal in
    zero-egress environments where the random-weight Inception head's
    splits are constant (IS == 1.0 exactly at every checkpoint). Clearly
    dataset-specific: values are NOT comparable to Inception-based IS/FID.
    """
    import jax as _jax
    from ..train.checkpoint import restore_params

    params = restore_params(path, template=None)
    p = params["params"]
    depth = sum(1 for k in p if k.startswith("conv") and k.endswith("a"))
    cfg = ClassifierConfig(
        num_classes=int(p["head"]["kernel"].shape[-1]),
        ch=int(p["conv0a"]["kernel"].shape[-1]),
        depth=depth)
    model = SmallCNN(cfg)

    @_jax.jit
    def _run(x):
        return model.apply(params, x, return_features=True)

    def feature_fn(images):
        return _run(images)[1]

    def logit_fn(images):
        return _run(images)[0]

    provenance = (f"classifier:{path} ({cfg.num_classes}-class SmallCNN, "
                  "dataset-specific — not comparable to Inception IS/FID)")
    return feature_fn, logit_fn, provenance
