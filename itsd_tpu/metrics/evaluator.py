"""Class-style metric evaluators — the API surface of the reference's
`utils/metrics.py` (FID / IS / CLIPScore classes, C19-C21), built on the
functional pieces in this package.

Images are NHWC in [0,1] here (callers convert from [-1,1] with
`search.verifiers.to_unit_range`). Feature extraction is on-device and
batched; the float64 Fréchet solve runs on host (TPUs are slow at f64).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .features import default_extractors, make_inception_extractors
from .frechet import frechet_distance, gaussian_stats
from .is_score import inception_score


def _batched(fn, images, batch_size):
    outs = []
    for i in range(0, images.shape[0], batch_size):
        outs.append(np.asarray(fn(jnp.asarray(images[i:i + batch_size]))))
    return np.concatenate(outs)


def load_images(paths, size: Optional[int] = None) -> np.ndarray:
    """Read image files into an [N,H,W,3] float array in [0,1] — the
    path-based entry of the reference's extractors
    (`utils/metrics.py:89-133` walks PNG paths in batches). All images
    must share a size unless ``size`` resizes them."""
    from PIL import Image

    arrs = []
    for p in paths:
        im = Image.open(p).convert("RGB")
        if size is not None:
            im = im.resize((size, size), Image.BILINEAR)
        arrs.append(np.asarray(im, np.float32) / 255.0)
    if not arrs:
        raise ValueError("no image paths given")
    shapes = {a.shape for a in arrs}
    if len(shapes) > 1:
        raise ValueError(f"mixed image sizes {shapes}; pass size= to resize")
    return np.stack(arrs)


class FID:
    """Fréchet Inception Distance (`utils/metrics.py:19-308`)."""

    def __init__(self, weights_path: Optional[str] = None,
                 batch_size: int = 64):
        if weights_path:
            self.feature_fn, _, self.provenance = \
                make_inception_extractors(weights_path, batch_size)
        else:
            self.feature_fn, _, self.provenance = default_extractors()
        self.batch_size = batch_size

    def get_features(self, images) -> np.ndarray:
        """images [N,H,W,C] in [0,1] -> [N, D] features."""
        return _batched(self.feature_fn, np.asarray(images), self.batch_size)

    def extract_features(self, image_paths, size: Optional[int] = None):
        """Path-based extraction (`utils/metrics.py:89-133`)."""
        return self.get_features(load_images(image_paths, size))

    def compute_fid(self, real_features, fake_features,
                    eps: float = 1e-6) -> float:
        mu_r, s_r = gaussian_stats(real_features)
        mu_f, s_f = gaussian_stats(fake_features)
        return frechet_distance(mu_r, s_r, mu_f, s_f, eps)

    def __call__(self, real_images, fake_images) -> float:
        return self.compute_fid(self.get_features(real_images),
                                self.get_features(fake_images))


class IS:
    """Inception Score with the 10-split protocol
    (`utils/metrics.py:311-417`)."""

    def __init__(self, weights_path: Optional[str] = None,
                 batch_size: int = 64, splits: int = 10):
        _, self.logit_fn, self.provenance = (
            make_inception_extractors(weights_path, batch_size)
            if weights_path else default_extractors())
        if self.logit_fn is None:
            raise RuntimeError("IS needs a classifier (inception logits)")
        self.batch_size = batch_size
        self.splits = splits

    def __call__(self, images) -> Tuple[float, float]:
        return inception_score(self.logit_fn, np.asarray(images),
                               splits=self.splits,
                               batch_size=self.batch_size)


class CLIPScore:
    """CLIP feature similarity / diversity (`utils/metrics.py:420-567`).
    Needs converted CLIP params (see `metrics.clip`)."""

    def __init__(self, clip_params, batch_size: int = 64,
                 normalize_images: bool = True):
        import jax
        from .clip import (clip_image_features, model_image_size,
                           preprocess as clip_pre)
        self.batch_size = batch_size
        size = model_image_size(clip_params)

        @jax.jit
        def feat(x):
            f = clip_image_features(
                clip_params,
                clip_pre(x, image_size=size, normalize=normalize_images))
            return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)

        self.feature_fn = feat

    def get_features(self, images) -> np.ndarray:
        return _batched(self.feature_fn, np.asarray(images), self.batch_size)

    def similarity(self, fake_images, real_features) -> float:
        """Mean fake<->real cosine (`metrics.py:502-531`)."""
        fake = self.get_features(fake_images)
        real = np.asarray(real_features)
        sims = fake @ real.T
        return float(sims.mean())

    def diversity(self, fake_images) -> float:
        """1 - mean pairwise similarity (`metrics.py:533-548`)."""
        f = self.get_features(fake_images)
        sims = f @ f.T
        n = len(f)
        off = (sims.sum() - np.trace(sims)) / (n * (n - 1))
        return float(1.0 - off)
