"""Image grid saving — torchvision.utils.save_image equivalent (the
reference saves per-epoch sample grids, `Train.py:782-801`)."""

from __future__ import annotations

import os

import numpy as np


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """[N,H,W,C] in [-1,1] or [0,1] -> single [GH,GW,C] uint8 grid."""
    images = np.asarray(images)
    if images.min() < -0.01:  # [-1,1] -> [0,1]
        images = (images + 1.0) / 2.0
    images = np.clip(images, 0.0, 1.0)
    n, h, w, c = images.shape
    ncol = int(np.ceil(n / nrow))
    grid = np.full((ncol * (h + pad) + pad, nrow * (w + pad) + pad, c),
                   pad_value, dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        y = r * (h + pad) + pad
        x = col * (w + pad) + pad
        grid[y:y + h, x:x + w] = images[i]
    return (grid * 255.0 + 0.5).astype(np.uint8)


def save_image_grid(images, path: str, nrow: int = 8) -> None:
    from PIL import Image
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    grid = make_grid(np.asarray(images), nrow=nrow)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)
