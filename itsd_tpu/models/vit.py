"""ViT denoiser backbone — the alternate model family from
`/root/reference/Diffusion/Model.py:289-456` (PatchEmbedding /
TransformerBlock / ViT).

Patch-embed -> learnable pos-embed -> N pre-LN transformer blocks (MHA, then
a time-embedding token-broadcast bias, then a swish MLP) -> final LN ->
linear head -> un-patchify. Multi-head attention runs through
`kernels.attention.mha_attention` so the TPU flash path applies here too.
"""

from __future__ import annotations

import dataclasses
import jax.numpy as jnp
from flax import linen as nn

from ..kernels.attention import mha_attention
from .embeddings import FunctionalTimeEmbedding, xavier, zeros


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 256
    patch_size: int = 16
    in_ch: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.1
    attention_impl: str = "auto"
    dtype: str = "float32"
    # Rematerialise each transformer block in the backward pass. The v5e
    # trace (docs/results/mfu_vit_train.json) shows the ViT backward is
    # HBM-bound on stored residual/LayerNorm activations (output fusions at
    # 0.17 FLOP/byte) while the forward has MXU headroom (54% MFU) — so
    # recomputing activations instead of storing them trades idle-MXU FLOPs
    # for the scarce resource.
    remat: bool = False

    @property
    def n_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


class TransformerBlock(nn.Module):
    """Pre-LN MHA + (optional temb bias) + swish MLP.
    Reference: `Model.py:314-354`."""
    embed_dim: int
    num_heads: int
    mlp_ratio: float
    dropout: float
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        B, N, E = x.shape
        H = self.num_heads
        D = E // H
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        q = nn.Dense(E, kernel_init=xavier, bias_init=zeros,
                     dtype=self.dtype, name="q")(h).reshape(B, N, H, D)
        k = nn.Dense(E, kernel_init=xavier, bias_init=zeros,
                     dtype=self.dtype, name="k")(h).reshape(B, N, H, D)
        v = nn.Dense(E, kernel_init=xavier, bias_init=zeros,
                     dtype=self.dtype, name="v")(h).reshape(B, N, H, D)
        o = mha_attention(q, k, v, impl=self.attention_impl).reshape(B, N, E)
        o = nn.Dense(E, kernel_init=xavier, bias_init=zeros,
                     dtype=self.dtype, name="out")(o)
        x = x + nn.Dropout(self.dropout, deterministic=deterministic)(o)
        if temb is not None:
            x = x + temb[:, None, :]
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(int(E * self.mlp_ratio), kernel_init=xavier,
                     bias_init=zeros, dtype=self.dtype, name="mlp1")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(E, kernel_init=xavier, bias_init=zeros,
                     dtype=self.dtype, name="mlp2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + h


class ViT(nn.Module):
    """__call__(x [B,H,W,C], t [B]) -> eps [B,H,W,C]."""
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, t, *, deterministic: bool = True):
        cfg = self.cfg
        dtype = cfg.jnp_dtype
        B, H, W, C = x.shape
        p = cfg.patch_size
        assert H % p == 0 and W % p == 0

        # Patch embedding: conv stride p (`Model.py:289-311`); in NHWC this
        # is a strided conv straight onto [B, H/p, W/p, E].
        x = nn.Conv(cfg.embed_dim, (p, p), strides=(p, p),
                    kernel_init=xavier, bias_init=zeros, dtype=dtype,
                    name="patch_embed")(x.astype(dtype))
        hp, wp = x.shape[1], x.shape[2]
        x = x.reshape(B, hp * wp, cfg.embed_dim)

        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.n_patches, cfg.embed_dim))
        x = x + pos.astype(dtype)

        temb = FunctionalTimeEmbedding(cfg.embed_dim, cfg.embed_dim * 4,
                                       dtype, name="time_embedding")(t)
        temb = nn.Dense(cfg.embed_dim, kernel_init=xavier, bias_init=zeros,
                        dtype=dtype, name="temb_proj")(temb)

        block_cls = TransformerBlock
        if cfg.remat:
            # static_argnums: `deterministic` is a Python bool switch
            block_cls = nn.remat(TransformerBlock, static_argnums=(3,))
        for i in range(cfg.depth):
            x = block_cls(
                cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio, cfg.dropout,
                cfg.attention_impl, dtype, name=f"block_{i}")(
                    x, temb, deterministic)

        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x).astype(dtype)
        x = nn.Dense(p * p * C, kernel_init=xavier, bias_init=zeros,
                     dtype=dtype, name="head")(x)

        # Un-patchify: [B, hp*wp, p*p*C] -> [B, H, W, C]
        x = x.reshape(B, hp, wp, p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
        return x.astype(jnp.float32)
