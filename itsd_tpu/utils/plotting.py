"""Loss/metric curve plotting — parity with `plot_loss_curve` /
`plot_metrics_curves` (`/root/reference/Diffusion/Train.py:247-401`):
smoothed + downsampled loss-vs-step with a stats box, and FID/IS/CLIP vs
denoising progress."""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _ensure_dir(path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)


def plot_loss_curve(losses: Sequence[float], path: str,
                    smooth_window: int = 50, max_points: int = 2000) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    losses = np.asarray(losses, dtype=np.float64)
    _ensure_dir(path)
    fig, ax = plt.subplots(figsize=(10, 5))
    steps = np.arange(len(losses))
    if len(losses) > max_points:
        stride = len(losses) // max_points
        steps, shown = steps[::stride], losses[::stride]
    else:
        shown = losses
    ax.plot(steps, shown, alpha=0.3, label="loss")
    if len(losses) >= smooth_window:
        kernel = np.ones(smooth_window) / smooth_window
        smooth = np.convolve(losses, kernel, mode="valid")
        ax.plot(np.arange(len(smooth)) + smooth_window // 2, smooth,
                label=f"smoothed (w={smooth_window})")
    stats = (f"final: {losses[-1]:.4f}\nmin: {losses.min():.4f}\n"
             f"mean: {losses.mean():.4f}")
    ax.text(0.98, 0.95, stats, transform=ax.transAxes, ha="right",
            va="top", bbox=dict(boxstyle="round", alpha=0.2))
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.legend()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_metrics_curves(history: List[Tuple[int, float, float, float]],
                        path: str, T: Optional[int] = None) -> None:
    """history rows: (t, fid, is, clip) — the tuple layout of the reference's
    metric-tracked sampling (`Train.py:25-166`). NaNs are plotted as gaps."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure_dir(path)
    hist = np.asarray(history, dtype=np.float64)
    ts = hist[:, 0]
    names = ["FID", "IS", "CLIP"]
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for i, (ax, name) in enumerate(zip(axes, names)):
        vals = hist[:, i + 1]
        ax.plot(ts, vals, marker="o")
        ax.set_xlabel("denoising timestep t")
        ax.set_ylabel(name)
        ax.set_title(f"{name} during denoising")
        if T is not None:
            ax.set_xlim(T, 0)
        else:
            ax.invert_xaxis()
    fig.tight_layout()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
