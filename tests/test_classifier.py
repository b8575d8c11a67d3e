"""SmallCNN classifier + classifier_verifier wiring (workload 3)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from itsd_tpu.models.classifier import (ClassifierConfig, SmallCNN,
                                        train_classifier)
from itsd_tpu.search import classifier_verifier


def _separable_data(n=512, img=8, classes=4, seed=0):
    """Classes are distinguishable by mean brightness — learnable fast."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, classes, n).astype(np.int32)
    base = (labels / classes)[:, None, None, None]
    images = base + rng.normal(0, 0.05, (n, img, img, 3))
    return np.clip(images, 0, 1).astype(np.float32), labels


@pytest.mark.slow
def test_classifier_learns_separable_data():
    images, labels = _separable_data()
    cfg = ClassifierConfig(num_classes=4, ch=16, depth=2)
    logit_fn, params, acc = train_classifier(images, labels, cfg,
                                             epochs=8, batch_size=64,
                                             lr=2e-3)
    assert acc > 0.9, acc


@pytest.mark.slow
def test_classifier_verifier_prefers_right_class():
    images, labels = _separable_data(n=256)
    cfg = ClassifierConfig(num_classes=4, ch=16, depth=2)
    logit_fn, _, acc = train_classifier(images, labels, cfg, epochs=8,
                                        batch_size=64, lr=2e-3)
    # images of class 3 (bright): verifier with target 3 scores them higher
    # than verifier with target 0
    sel = images[labels == 3][:8] * 2 - 1  # to [-1,1] as sampler output
    v3 = classifier_verifier(logit_fn, jnp.full((8,), 3))
    v0 = classifier_verifier(logit_fn, jnp.full((8,), 0))
    assert float(v3(jnp.asarray(sel))) > float(v0(jnp.asarray(sel)))


@pytest.mark.slow
def test_classifier_shapes():
    m = SmallCNN(ClassifierConfig(num_classes=10, ch=8, depth=2))
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)))
    out = m.apply(p, jnp.zeros((5, 16, 16, 3)))
    assert out.shape == (5, 10)
