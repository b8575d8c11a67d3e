"""Time and label embeddings.

Two time-embedding flavours, exactly mirroring the reference's capability
split:

* ``FunctionalTimeEmbedding`` — sinusoids computed *functionally* for any
  integer t (`/root/reference/Diffusion/Model.py:15-93`). This is what makes
  ``inference_T != training T`` free: no table is baked into the weights.
* ``TableTimeEmbedding`` — classic DDPM ``[T, d_model]`` sinusoid table as a
  *trainable* embedding (`/root/reference/DiffusionFreeGuidence/
  ModelCondition.py:24-46`). T is baked into the parameter shape — this is
  the flavour the cross-T checkpoint-surgery tools operate on.

Plus ``ConditionalEmbedding`` with the reference's null-class convention:
label 0 is the unconditional class and must embed to exactly zero
(`ModelCondition.py:49-62` uses ``padding_idx=0``; here the output is masked
by ``labels != 0``, which both zeroes the embedding and kills its gradient —
functionally identical, and trace-friendly).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

xavier = nn.initializers.xavier_uniform()
# torch's xavier_uniform with gain g has variance g^2/fan_avg -> scale = g^2.
tiny_xavier = nn.initializers.variance_scaling(1e-10, "fan_avg", "uniform")
zeros = nn.initializers.zeros


def sinusoidal_features(t: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """Interleaved [sin0, cos0, sin1, cos1, ...] sinusoids, shape [B, d_model].

    Matches the reference's frequency layout (`Model.py:34-35,76-88`):
    freq_k = exp(-(2k / d_model) * ln(10000)).
    """
    assert d_model % 2 == 0
    half = d_model // 2
    freqs = jnp.exp(
        -jnp.arange(0, d_model, 2, dtype=jnp.float32) / d_model
        * math.log(10000.0))
    emb = t.astype(jnp.float32)[:, None] * freqs[None, :]  # [B, half]
    emb = jnp.stack([jnp.sin(emb), jnp.cos(emb)], axis=-1)  # [B, half, 2]
    return emb.reshape(t.shape[0], d_model)


class _EmbedMLP(nn.Module):
    """Linear -> swish -> Linear projection shared by all embedding heads."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, kernel_init=xavier, bias_init=zeros,
                     dtype=self.dtype, name="fc1")(x)
        x = nn.silu(x)
        x = nn.Dense(self.dim, kernel_init=xavier, bias_init=zeros,
                     dtype=self.dtype, name="fc2")(x)
        return x


class FunctionalTimeEmbedding(nn.Module):
    """t -> [B, dim]; works for any integer t (T-extension is free)."""
    d_model: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        emb = sinusoidal_features(t.reshape(-1), self.d_model)
        return _EmbedMLP(self.dim, self.dtype, name="mlp")(
            emb.astype(self.dtype))


class TableTimeEmbedding(nn.Module):
    """Trainable [T, d_model] sinusoid table + MLP. T baked into params —
    the target of `detect_checkpoint_T` / interpolate-or-reinit surgery
    (`/root/reference/abstract_metrics_from_pretrained_ddpm.py:163-277`)."""
    T: int
    d_model: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        def table_init(key, shape, dtype=jnp.float32):
            ts = jnp.arange(shape[0], dtype=jnp.float32)
            return sinusoidal_features(ts, shape[1]).astype(dtype)

        table = self.param("table", table_init, (self.T, self.d_model))
        emb = jnp.take(table, t.reshape(-1), axis=0)
        return _EmbedMLP(self.dim, self.dtype, name="mlp")(
            emb.astype(self.dtype))


class ConditionalEmbedding(nn.Module):
    """labels (0 = null/unconditional) -> [B, dim], zero at the null class."""
    num_labels: int
    d_model: int
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "table", nn.initializers.normal(1.0),
            (self.num_labels + 1, self.d_model))
        emb = jnp.take(table, labels.reshape(-1), axis=0)
        # padding_idx=0 semantics: null class embeds to zero, no gradient.
        mask = (labels.reshape(-1) != 0).astype(emb.dtype)[:, None]
        emb = emb * mask
        return _EmbedMLP(self.dim, self.dtype, name="mlp")(
            emb.astype(self.dtype))
