"""Cross-T checkpoint surgery + selective freezing.

TPU-native rebuild of the T-extension machinery
(`/root/reference/abstract_metrics_from_pretrained_ddpm.py:163-277`,
`/root/reference/fine_tune_extended_T.py:200-288`):

* ``detect_checkpoint_T`` — sniff the trained T from the time-embedding
  table shape (table-embedding checkpoints bake T into the weights; the
  functional embedding has no table, in which case any inference_T works
  with zero surgery — that is the preferred path,
  `example/train_val_imagenet_ep15_bs40_T3000_lr1e-4.sh:36-37`).
* ``extend_time_embedding`` — interpolate (linear resample of table rows) or
  reinit (fresh sinusoid table at the new T), keeping the MLP weights.
* ``freeze_except_time_embedding`` — optax mask so fine-tuning updates only
  the time-embedding parameters (`fine_tune_extended_T.py:267-288`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.embeddings import sinusoidal_features


def _find_table(params: Any) -> Optional[jnp.ndarray]:
    """Locate time_embedding/table in a params pytree (dict-of-dicts)."""
    p = params.get("params", params)
    te = p.get("time_embedding")
    if te is None:
        return None
    return te.get("table")


def detect_checkpoint_T(params: Any) -> Optional[int]:
    """Trained T if the checkpoint uses a table embedding, else None
    (functional embedding — T-agnostic)."""
    table = _find_table(params)
    return None if table is None else int(table.shape[0])


def extend_time_embedding(params: Any, new_T: int,
                          strategy: str = "interpolate") -> Any:
    """Return params with the time-embedding table resized to ``new_T``.

    strategy="interpolate": linear resample of the learned table over the
    timestep axis (`abstract_metrics…py` strategy "interpolate").
    strategy="reinit": fresh sinusoid table at new_T (strategy "reinit");
    matches dropping `time_embedding.*` keys and rebuilding at the new T
    (`fine_tune_extended_T.py:200-223`) while keeping the MLP.
    """
    table = _find_table(params)
    if table is None:
        return params  # functional embedding: nothing to do
    old_T, d_model = table.shape
    if old_T == new_T:
        return params

    if strategy == "interpolate":
        old = np.asarray(table)
        # map new index i to old coordinate i * (old_T - 1) / (new_T - 1)
        coords = np.linspace(0.0, old_T - 1, new_T)
        lo = np.floor(coords).astype(np.int64)
        hi = np.minimum(lo + 1, old_T - 1)
        frac = (coords - lo)[:, None]
        new_table = old[lo] * (1 - frac) + old[hi] * frac
        new_table = jnp.asarray(new_table, dtype=table.dtype)
    elif strategy == "reinit":
        new_table = sinusoidal_features(
            jnp.arange(new_T), d_model).astype(table.dtype)
    else:
        raise ValueError(f"unknown strategy: {strategy!r}")

    def replace(tree):
        out = dict(tree)
        if "time_embedding" in out:
            te = dict(out["time_embedding"])
            te["table"] = new_table
            out["time_embedding"] = te
        return out

    if "params" in params:
        return {**params, "params": replace(params["params"])}
    return replace(params)


def time_embedding_mask(params: Any) -> Any:
    """Pytree of bools: True on time-embedding params, False elsewhere."""
    p = params.get("params", params)

    def mark(path_has_te, tree):
        return jax.tree.map(lambda _: path_has_te, tree)

    masked = {k: mark(k == "time_embedding", v) for k, v in p.items()}
    if "params" in params:
        return {**{k: jax.tree.map(lambda _: False, v)
                   for k, v in params.items() if k != "params"},
                "params": masked}
    return masked


def freeze_except_time_embedding(
        tx: optax.GradientTransformation, params: Any
) -> optax.GradientTransformation:
    """Wrap an optimizer so only time-embedding params update — the
    fine-tune policy of `fine_tune_extended_T.py:267-288`."""
    mask = time_embedding_mask(params)
    label = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, label)
