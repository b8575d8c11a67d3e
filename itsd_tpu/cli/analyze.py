"""Representation analysis CLI — rebuild of
`/root/reference/analyze_representations.py`: load per-epoch representation
dumps, print stats (mean/std/min/max/label histogram), PCA->50 then t-SNE
scatter colored by class, and per-epoch mean±std evolution plot.

Usage:
    python -m itsd_tpu.cli.analyze --repr-dir ckpt/representations \
        --out-dir analysis/
"""

from __future__ import annotations

import argparse
import glob
import os
from typing import Dict, Tuple

import numpy as np


def load_representations(repr_dir: str) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """epoch -> (representations [N,D], labels [N]). Mirrors
    `analyze_representations.py::load_representations`."""
    out = {}
    for path in sorted(glob.glob(os.path.join(repr_dir, "epoch_*.npz"))):
        epoch = int(os.path.basename(path)[len("epoch_"):-len(".npz")])
        d = np.load(path)
        out[epoch] = (d["representations"], d["labels"])
    return out


def representation_stats(reps: np.ndarray, labels: np.ndarray) -> dict:
    hist = np.bincount(labels, minlength=int(labels.max()) + 1)
    return {
        "n": len(reps), "dim": reps.shape[1],
        "mean": float(reps.mean()), "std": float(reps.std()),
        "min": float(reps.min()), "max": float(reps.max()),
        "label_histogram": hist.tolist(),
    }


def visualize_representations_tsne(reps: np.ndarray, labels: np.ndarray,
                                   path: str, pca_dim: int = 50,
                                   perplexity: float = 30.0) -> None:
    """PCA->50 then t-SNE scatter colored by class
    (`analyze_representations.py` main visualization)."""
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = reps
    if x.shape[1] > pca_dim:
        x = PCA(n_components=min(pca_dim, len(x) - 1)).fit_transform(x)
    perplexity = min(perplexity, max(2.0, (len(x) - 1) / 3))
    emb = TSNE(n_components=2, perplexity=perplexity,
               init="pca", random_state=0).fit_transform(x)

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 7))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=labels, cmap="tab10", s=12,
                    alpha=0.8)
    fig.colorbar(sc, ax=ax, label="class")
    ax.set_title("UNet pre-tail representations (PCA -> t-SNE)")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def visualize_representation_evolution(
        per_epoch: Dict[int, Tuple[np.ndarray, np.ndarray]],
        path: str) -> None:
    """Per-epoch mean±std of representation activations."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = sorted(per_epoch)
    means = [per_epoch[e][0].mean() for e in epochs]
    stds = [per_epoch[e][0].std() for e in epochs]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.errorbar(epochs, means, yerr=stds, marker="o", capsize=3)
    ax.set_xlabel("epoch")
    ax.set_ylabel("representation activation (mean ± std)")
    ax.set_title("Representation evolution during training")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    # reference spellings (--representation_dir/--output_dir,
    # `analyze_representations.py:176-183`) accepted as aliases
    p.add_argument("--repr-dir", "--representation_dir", required=True,
                   dest="repr_dir")
    p.add_argument("--out-dir", "--output_dir", default="./analysis",
                   dest="out_dir")
    p.add_argument("--epoch", type=int, default=None,
                   help="analyze this epoch only (default: stats for all, "
                        "t-SNE of the last)")
    p.add_argument("--max-samples", "--max_samples", type=int, default=1000,
                   dest="max_samples",
                   help="subsample cap for the t-SNE embedding")
    p.add_argument("--pca-dim", type=int, default=50)
    p.add_argument("--perplexity", type=float, default=30.0)
    args = p.parse_args(argv)

    per_epoch = load_representations(args.repr_dir)
    if args.epoch is not None:
        per_epoch = {e: v for e, v in per_epoch.items() if e == args.epoch}
    if not per_epoch:
        print(f"no representation files found in {args.repr_dir}"
              + (f" for epoch {args.epoch}" if args.epoch is not None
                 else ""))
        return 1
    for epoch, (reps, labels) in per_epoch.items():
        print(f"epoch {epoch}: {representation_stats(reps, labels)}")
    last = max(per_epoch)
    reps, labels = per_epoch[last]
    if len(reps) > args.max_samples:
        sel = np.random.default_rng(0).choice(len(reps), args.max_samples,
                                              replace=False)
        reps, labels = reps[sel], labels[sel]
    visualize_representations_tsne(
        reps, labels, os.path.join(args.out_dir, f"tsne_epoch_{last}.png"),
        pca_dim=args.pca_dim, perplexity=args.perplexity)
    visualize_representation_evolution(
        per_epoch, os.path.join(args.out_dir, "representation_evolution.png"))
    print(f"wrote analysis to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
