"""Sequence-parallel (ring) attention over a mesh axis.

The reference's flagship operating point puts attention at 64x64 = 4096
tokens and materialises the full ``[HW, HW]`` score matrix on ONE device
(`/root/reference/Diffusion/Model.py:145-164`) — its scaling wall. The
Pallas flash kernel (`attention.py`) removes the score matrix from HBM;
this module removes the single-chip *token* ceiling: q/k/v shard over a
mesh axis ("sp"), each device runs the blockwise kernel on its local
queries against whichever k/v shard it currently holds, and the k/v
shards rotate around the ring via ``ppermute`` (one ICI hop per step)
while the partial outputs merge in log-sum-exp space. This is Ring
Attention (arXiv 2310.01889; see PAPERS.md) expressed the TPU way:
``shard_map`` for the per-device program, ``lax.scan`` for the rotation,
XLA collectives riding ICI.

Differentiable end-to-end with NO new kernels: the per-shard partial is
the stats-emitting flash forward, and its custom VJP folds the incoming
``lse`` cotangent into the existing blockwise backward — from
``ds = p * (dp - dd)`` and ``d(lse)/ds = p`` it follows that
``ds_total = p * (dp - (dd - dlse))``, i.e. the same kernels called with
``dd := dd - dlse``. The ring loop is a ``lax.scan`` whose reverse pass
replays the ``ppermute``s in the opposite direction.

Memory note: the scan's reverse pass stores each step's (o_i, lse_i)
residuals — O(N_global x C / axis) per device, the same order as the
attention output itself. The score matrix never exists anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .attention import (_HAS_PLTPU, _attention_flash_bwd,
                        _attention_flash_stats, _flash_eligible)

try:  # moved in newer JAX; support both spellings
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _attention_xla_stats(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         scale: float):
    """[B, N, C] single-head attention that also returns the per-row
    log-sum-exp — the XLA ground-truth twin of `_attention_flash_stats`."""
    s = jnp.einsum("bqc,bkc->bqk", q, k,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bqk,bkc->bqc", (p / l).astype(v.dtype), v,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST).astype(v.dtype)
    return o, (m + jnp.log(l)).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def flash_attention_with_stats(scale: float, interpret: bool, q, k, v):
    """Differentiable flash attention returning ``(o, lse)``.

    Unlike `_flash_attention_diff` the ``lse`` output is part of the
    public result, so its cotangent is honored in the backward (the ring
    merge differentiates through lse)."""
    return _attention_flash_stats(q, k, v, scale, interpret=interpret)


def _flash_stats_fwd(scale, interpret, q, k, v):
    o, lse = _attention_flash_stats(q, k, v, scale, interpret=interpret)
    return (o, lse), (q, k, v, o, lse)


def _flash_stats_bwd(scale, interpret, res, cots):
    q, k, v, o, lse = res
    do, dlse = cots
    return _attention_flash_bwd(q, k, v, o, lse, do, scale,
                                dlse=dlse, interpret=interpret)


flash_attention_with_stats.defvjp(_flash_stats_fwd, _flash_stats_bwd)


def attention_with_stats(q, k, v, scale: float | None = None,
                         impl: str = "auto", interpret: bool = False):
    """Dispatching (o, lse) attention: Pallas flash when the local shard
    tiles onto the MXU, XLA otherwise (and always on CPU tests)."""
    C = q.shape[-1]
    scale = float(C) ** -0.5 if scale is None else scale
    use_flash = impl == "flash" or (
        impl == "auto" and _HAS_PLTPU and jax.default_backend() == "tpu"
        and _flash_eligible(q.shape[1], C))
    if use_flash:
        return flash_attention_with_stats(scale, interpret, q, k, v)
    return _attention_xla_stats(q, k, v, scale)


def ring_attention(q, k, v, axis_name: str, impl: str = "auto",
                   interpret: bool = False) -> jnp.ndarray:
    """Per-device ring attention body — call inside ``shard_map``.

    Args:
      q, k, v: the LOCAL ``[B, N/axis, C]`` shards (tokens sharded over
        ``axis_name``; batch may be sharded over a different mesh axis —
        attention is batch-parallel so the ring never sees it).
      axis_name: the mesh axis the token dimension is sharded over.

    Exact (not approximate): after ``axis_size`` rotations every query
    shard has attended to every key/value shard; partials combine by the
    standard log-sum-exp merge, accumulating in f32.
    """
    steps = int(jax.lax.psum(1, axis_name))  # static mesh-axis size
    scale = float(q.shape[-1]) ** -0.5
    perm = [(j, (j - 1) % steps) for j in range(steps)]

    def attend(k_cur, v_cur):
        return attention_with_stats(q, k_cur, v_cur, scale,
                                    impl=impl, interpret=interpret)

    # Attend to the local shard first, THEN rotate steps-1 times — no dead
    # final ppermute (on a T-step chain with several attention layers that
    # would be thousands of wasted ICI copies).
    o_first, lse = attend(k, v)
    o = o_first.astype(jnp.float32)

    def body(carry, _):
        k_cur, v_cur, o, lse = carry
        # rotate the k/v shards one hop around the ring (ICI neighbor copy)
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        o_i, lse_i = attend(k_cur, v_cur)
        m = jnp.maximum(lse, lse_i)
        w, w_i = jnp.exp(lse - m), jnp.exp(lse_i - m)
        denom = w + w_i
        o = (o * w + o_i.astype(jnp.float32) * w_i) / denom
        lse = m + jnp.log(denom)
        return (k_cur, v_cur, o, lse), None

    if steps > 1:
        (_, _, o, _), _ = jax.lax.scan(body, (k, v, o, lse), None,
                                       length=steps - 1)
    return o.astype(q.dtype)


def sequence_sharded_attention(q, k, v, mesh: Mesh, axis: str = "seq",
                               batch_axis: str | None = None,
                               impl: str = "auto",
                               interpret: bool = False) -> jnp.ndarray:
    """Global-view entry: ``[B, N, C]`` attention with the token axis
    sharded over ``mesh[axis]`` (and optionally batch over ``batch_axis``).

    Requires ``N % mesh.shape[axis] == 0`` (static shapes tile the ring).
    Numerically equal to single-device attention — proven against
    `_attention_xla` in tests/test_ring_attention.py on the virtual mesh.
    """
    n = q.shape[1]
    size = mesh.shape[axis]
    assert n % size == 0, (
        f"token count {n} must divide over seq axis {axis!r} ({size})")
    spec = P(batch_axis, axis, None)
    fn = functools.partial(ring_attention, axis_name=axis, impl=impl,
                           interpret=interpret)
    return _shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                      out_specs=spec)(q, k, v)
