"""Spatial self-attention over H*W tokens — XLA path + Pallas flash kernel.

The reference materialises the full ``[B, HW, HW]`` score matrix with two
bmms (`/root/reference/Diffusion/Model.py:145-164`), which is its scaling
wall at img_size=256 / 64x64-token stages (4096^2 scores per image). Here:

* ``_attention_xla``: einsum + softmax — good for small token counts; XLA
  fuses it well and it is the CPU-test path.
* ``_attention_flash``: Pallas blockwise online-softmax attention that never
  materialises the score matrix in HBM. Grid is (batch*heads, q-blocks,
  k-blocks); the k dimension is innermost so running max/denominator/
  accumulator live in VMEM scratch across the k sweep.

`spatial_attention` dispatches: "auto" uses flash on TPU when shapes tile
cleanly, XLA otherwise. Everything is single-head (matching the reference's
AttnBlock); `mha_attention` vmaps heads for the ViT.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu import fails on some CPU-only builds; guard it.
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float) -> jnp.ndarray:
    """[B, N, C] single-head attention via explicit score matrix (XLA fuses
    the softmax; fine for small N, reference-semantics ground truth)."""
    # precision=HIGHEST: the default matmul precision truncates f32 operands
    # to bf16; attention weights need the full mantissa. (bf16 inputs still
    # take the fast MXU path — accumulation is f32 either way.)
    scores = jnp.einsum("bqc,bkc->bqk", q, k,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) * scale
    w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkc->bqc", w, v,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST).astype(v.dtype)


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *rest, scale: float,
                      kv_blocks: int, emit_lse: bool):
    """ONE online-softmax forward kernel for both entry points: the plain
    forward and the stats-emitting forward (per-row log-sum-exp for the
    blockwise backward / ring merge) — `emit_lse` is a trace-time constant,
    so the two variants can never drift apart numerically."""
    if emit_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        acc_ref, m_ref, l_ref = rest
    kb = pl.program_id(2)
    # f32 operands need HIGHEST to avoid bf16 truncation; bf16 operands must
    # use default precision (Mosaic rejects an fp32-contract annotation on
    # bf16 inputs) — accumulation is f32 either way via preferred_element_type.
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else None)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [bq, c]
    k = k_ref[0]  # [bk, c]
    v = v_ref[0]  # [bk, c]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32,
                precision=prec) * scale  # [bq,bk]
    m_prev = m_ref[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    correction = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur[:, None])
    l_ref[:, 0] = l_ref[:, 0] * correction + jnp.sum(p, axis=-1)
    m_ref[:, 0] = m_cur
    acc_ref[:] = (acc_ref[:] * correction[:, None]
                  + jnp.dot(p.astype(v.dtype), v,
                            preferred_element_type=jnp.float32,
                            precision=prec))

    @pl.when(kb == kv_blocks - 1)
    def _finish():
        l = l_ref[:, 0]
        o_ref[0] = (acc_ref[:] / l[:, None]).astype(o_ref.dtype)
        if emit_lse:
            lse_ref[0] = (m_ref[:, 0] + jnp.log(l))[:, None]


# ---------------------------------------------------------------------------
# VMEM-footprint-aware block selection.
#
# Scoped VMEM (the on-chip stack for pallas windows + intermediates) is
# ~16 MB per concurrently-scheduled op on v5e. The dkv backward at the old
# fixed (512, 1024) blocks with C=512 needs ~19 MB estimated (~18.84 MB
# observed: the 256x256 ch=128 train step failed to COMPILE at batch >= 24
# with "Scoped allocation with size 18.84M and limit 16.00M", see
# docs/results/imagenet256.json train_memory_sweep + docs/PERF.md) — an
# on-chip SRAM wall, not an HBM one. The estimators below model each
# kernel's footprint (double-buffered in/out windows + f32 accumulators +
# f32 score-sized intermediates) and the pair chooser walks a
# perf-preference list, returning the first pair that fits the budget.
# ---------------------------------------------------------------------------

_DB = 2  # Mosaic double-buffers each in/out window across grid steps


def _fwd_vmem_estimate(bq: int, bk: int, c: int, itemsize: int) -> int:
    win = _DB * (2 * bq * c + 2 * bk * c) * itemsize   # q + o in/out; k, v
    scratch = (bq * c + 2 * bq) * 4                    # acc + m + l (f32)
    inter = 2 * bq * bk * 4                            # s, p (f32)
    return win + scratch + inter


def _dq_vmem_estimate(bq: int, bk: int, c: int, itemsize: int) -> int:
    win = _DB * (2 * bq * c + 2 * bk * c + bq * c) * itemsize  # q,do,k,v,dq
    scratch = bq * c * 4                                        # dq_acc
    inter = 4 * bq * bk * 4                                     # s,p,dp,ds
    return win + scratch + inter


def _dkv_vmem_estimate(bq: int, bk: int, c: int, itemsize: int) -> int:
    win = _DB * (2 * bk * c + 2 * bq * c + 2 * bk * c) * itemsize
    scratch = 2 * bk * c * 4                                    # dk/dv acc
    inter = 4 * bq * bk * 4
    return win + scratch + inter


# (block_q, block_k) in descending perf preference — (512, 1024) is the
# measured v5e forward optimum at the flagship shape (flash_tune.json).
_PAIR_PREFS = ((512, 1024), (512, 512), (256, 512), (512, 256), (256, 256),
               (128, 256), (256, 128), (128, 128))


def _vmem_budget_bytes() -> int:
    import os
    return int(float(os.environ.get("ITSD_FLASH_VMEM_BUDGET_MB", "16"))
               * (1 << 20))


def _pick_block_pair(n: int, c: int, itemsize: int, estimators) -> tuple:
    """First preference pair dividing ``n`` whose worst-case estimate over
    ``estimators`` fits the scoped-VMEM budget; the largest dividing pair
    as a last resort (tiny shapes where every estimate fits anyway)."""
    budget = _vmem_budget_bytes()
    fallback = None
    for bq, bk in _PAIR_PREFS:
        bq2, bk2 = min(bq, n), min(bk, n)
        if n % bq2 or n % bk2:
            continue
        if fallback is None:
            fallback = (bq2, bk2)
        if max(est(bq2, bk2, c, itemsize) for est in estimators) <= budget:
            return bq2, bk2
    return fallback if fallback is not None else (n, n)


def _require_pltpu():
    if not _HAS_PLTPU:
        raise RuntimeError(
            "flash attention requires jax.experimental.pallas.tpu, which "
            "failed to import on this build — use impl='xla' instead")


def _flash_forward(q, k, v, scale, block_q=0, block_k=0, interpret=False,
                   emit_lse=False):
    """Shared pallas_call scaffolding for the forward kernel. Block sizes
    default to the measured v5e optimum (512 x 1024) degrading to whatever
    divides N. Returns o, or (o, lse) when ``emit_lse``."""
    _require_pltpu()
    B, N, C = q.shape
    auto_q, auto_k = _pick_block_pair(N, C, q.dtype.itemsize,
                                      (_fwd_vmem_estimate,))
    block_q = min(block_q or auto_q, N)
    block_k = min(block_k or auto_k, N)
    assert N % block_q == 0 and N % block_k == 0, (N, block_q, block_k)
    kv_blocks = N // block_k
    kernel = functools.partial(_flash_fwd_kernel, scale=scale,
                               kv_blocks=kv_blocks, emit_lse=emit_lse)
    q_spec = pl.BlockSpec((1, block_q, C), lambda b, i, j: (b, i, 0))
    out_specs = (q_spec,
                 pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)))
    out_shape = (jax.ShapeDtypeStruct(q.shape, q.dtype),
                 jax.ShapeDtypeStruct((B, N, 1), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(B, N // block_q, kv_blocks),
        in_specs=[
            q_spec,
            pl.BlockSpec((1, block_k, C), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, C), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=out_specs if emit_lse else out_specs[0],
        out_shape=out_shape if emit_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, C), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


def _attention_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     scale: float, block_q: int = 0,
                     block_k: int = 0, interpret: bool = False
                     ) -> jnp.ndarray:
    """Pallas blockwise attention. q,k,v: [B, N, C]."""
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret,
                          emit_lse=False)


def _attention_flash_stats(q, k, v, scale, block_q=0, block_k=0,
                           interpret=False):
    """Forward that additionally emits the per-row log-sum-exp, which the
    blockwise backward needs to reconstruct p = exp(s - lse)."""
    return _flash_forward(q, k, v, scale, block_q, block_k, interpret,
                          emit_lse=True)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dd_ref,
                         dq_ref, dq_acc, *, scale: float, kv_blocks: int):
    kb = pl.program_id(2)
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else None)

    @pl.when(kb == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]  # [bq, 1] f32
    dd = dd_ref[0]    # [bq, 1] f32
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32,
                precision=prec) * scale
    p = jnp.exp(s - lse)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32,
                 precision=prec)
    ds = p * (dp - dd)
    dq_acc[:] += scale * jnp.dot(ds.astype(k.dtype), k,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)

    @pl.when(kb == kv_blocks - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dd_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float,
                          q_blocks: int):
    qb = pl.program_id(2)
    prec = (jax.lax.Precision.HIGHEST if q_ref.dtype == jnp.float32
            else None)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0]
    v = v_ref[0]
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    dd = dd_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32,
                precision=prec) * scale          # [bq, bk]
    p = jnp.exp(s - lse)                          # [bq, bk]
    dv_acc[:] += jnp.dot(p.astype(do.dtype).T, do,
                         preferred_element_type=jnp.float32, precision=prec)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32,
                 precision=prec)                  # [bq, bk]
    ds = p * (dp - dd)
    dk_acc[:] += scale * jnp.dot(ds.astype(q.dtype).T, q,
                                 preferred_element_type=jnp.float32,
                                 precision=prec)

    @pl.when(qb == q_blocks - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _attention_flash_bwd(q, k, v, o, lse, do, scale, block_q=0,
                         block_k=0, interpret=False, dlse=None):
    """Blockwise flash backward: O(block) memory, no score matrix in HBM.

    ``dlse`` (optional ``[B, N, 1]``) is the cotangent of the per-row
    log-sum-exp when the caller consumed it (ring attention's merge does).
    Since d(lse)/ds = p, it folds into the existing kernels exactly:
    ds = p*(dp - dd) + p*dlse = p*(dp - (dd - dlse)).
    """
    _require_pltpu()
    B, N, C = q.shape
    # budget-aware: BOTH bwd kernels share the pair, so both must fit
    # (the old fixed (512, 1024) overflowed scoped vmem at C=512 — the
    # 256x256 batch>=24 compile failure, docs/PERF.md)
    auto_q, auto_k = _pick_block_pair(N, C, q.dtype.itemsize,
                                      (_dq_vmem_estimate,
                                       _dkv_vmem_estimate))
    block_q = min(block_q or auto_q, N)
    block_k = min(block_k or auto_k, N)
    q_blocks = N // block_q
    kv_blocks = N // block_k
    # D_i = rowsum(dO * O) (the softmax-jacobian diagonal term)
    dd = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                 axis=-1, keepdims=True)  # [B, N, 1]
    if dlse is not None:
        dd = dd - dlse.astype(jnp.float32).reshape(B, N, 1)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale,
                          kv_blocks=kv_blocks),
        grid=(B, q_blocks, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, block_q, C), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, C), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, C), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, C), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, C), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, C), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, lse, dd)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                          q_blocks=q_blocks),
        grid=(B, kv_blocks, q_blocks),
        in_specs=[
            pl.BlockSpec((1, block_k, C), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, C), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, C), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, C), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, C), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, C), lambda b, i, j: (b, i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, C), jnp.float32),
            pltpu.VMEM((block_k, C), jnp.float32),
        ],
        interpret=interpret,
    )(k, v, q, do, lse, dd)
    return dq, dk, dv


def _flash_eligible(n: int, c: int) -> bool:
    """Flash path needs lane-aligned shapes to tile onto the MXU."""
    return n >= 256 and n % 256 == 0 and c % 128 == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_attention_diff(scale: float, q, k, v):
    """Differentiable flash attention: Pallas forward AND Pallas blockwise
    backward (pallas_call has no autodiff rule). Forward saves per-row
    log-sum-exp; backward recomputes p blockwise — O(block) memory in both
    directions, never the [N, N] score matrix."""
    return _attention_flash(q, k, v, scale)


def _flash_diff_fwd(scale, q, k, v):
    o, lse = _attention_flash_stats(q, k, v, scale)
    return o, (q, k, v, o, lse)


def _flash_diff_bwd(scale, res, g):
    q, k, v, o, lse = res
    return _attention_flash_bwd(q, k, v, o, lse, g, scale)


_flash_attention_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def _ring_dispatch(q, k, v, interpret: bool = False):
    """Sequence-parallel path. Mesh resolution order, most local intent
    first: (1) an ambient ``with mesh:`` context carrying a 'seq' axis,
    (2) the registry (`parallel.set_seq_mesh` — what the CLI uses), (3) a
    NON-persisted tokens-over-all-devices default (so ITSD_ATTN_IMPL=ring
    works standalone, and a later ``with mesh:`` is never shadowed by a
    stale auto-registration). Returns None when the token count does not
    tile — callers fall back loudly."""
    from ..parallel import default_seq_mesh, get_seq_mesh
    from .ring_attention import sequence_sharded_attention

    mesh = None
    try:
        import warnings as _warnings
        with _warnings.catch_warnings():
            # the accessor is deprecated-but-working; a global
            # warnings-as-errors filter must not break mesh resolution
            _warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla
            env = pxla.thread_resources.env.physical_mesh
        if env is not None and not env.empty and "seq" in env.axis_names:
            mesh = env
    except Exception:
        mesh = None
    if mesh is None:
        mesh = get_seq_mesh()
    if mesh is None:
        mesh = default_seq_mesh()
    if "seq" not in mesh.axis_names:
        return None
    if q.shape[1] % mesh.shape["seq"]:
        return None
    batch_axis = None
    if ("data" in mesh.axis_names and mesh.shape["data"] > 1
            and q.shape[0] % mesh.shape["data"] == 0):
        batch_axis = "data"
    return sequence_sharded_attention(q, k, v, mesh, axis="seq",
                                      batch_axis=batch_axis,
                                      interpret=interpret)


def spatial_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      impl: str = "auto",
                      interpret: bool = False) -> jnp.ndarray:
    """Single-head attention over flattened spatial tokens.

    Args:
      q, k, v: ``[B, N, C]`` (N = H*W). Scale is ``C**-0.5`` exactly as the
        reference (`Diffusion/Model.py:154`).
      impl: "xla" | "flash" | "ring" | "auto". "ring" shards the token
        axis over the registered seq mesh (sequence parallelism — exact,
        see `kernels/ring_attention.py`), falling back to "xla" with a
        warning when no mesh is registered or the tokens don't tile.
    """
    C = q.shape[-1]
    scale = float(C) ** -0.5
    if impl == "auto":
        import os
        env = os.environ.get("ITSD_ATTN_IMPL", "auto")
        if env == "xla":
            return _attention_xla(q, k, v, scale)
        if env == "ring":
            return spatial_attention(q, k, v, impl="ring",
                                     interpret=interpret)
        # Spatial partitioning active (a seq>1 mesh is registered, e.g.
        # train.spatial_shard): the plain flash custom call cannot be
        # spatially partitioned by GSPMD (it would gather the full token
        # axis per layer) — route through the ring, whose per-shard
        # partials still use flash when the local shard tiles.
        from ..parallel import get_seq_mesh
        m = get_seq_mesh()
        if (m is not None and "seq" in m.axis_names and m.shape["seq"] > 1
                and q.shape[1] % m.shape["seq"] == 0):
            out = _ring_dispatch(q, k, v, interpret=interpret)
            if out is not None:
                return out
        # env "flash"/"auto": flash when the shape tiles, xla otherwise
        if (_HAS_PLTPU and jax.default_backend() == "tpu"
                and _flash_eligible(q.shape[1], C)):
            return _flash_attention_diff(scale, q, k, v)
        return _attention_xla(q, k, v, scale)
    if impl == "xla":
        return _attention_xla(q, k, v, scale)
    if impl == "flash":
        if interpret:
            return _attention_flash(q, k, v, scale, interpret=True)
        return _flash_attention_diff(scale, q, k, v)
    if impl == "ring":
        out = _ring_dispatch(q, k, v, interpret=interpret)
        if out is not None:
            return out
        import warnings
        warnings.warn(
            f"attention_impl=ring: the token count ({q.shape[1]}) does not "
            "tile over the seq mesh axis (or the registered mesh has no "
            "'seq' axis) — falling back to the XLA path", stacklevel=2)
        return _attention_xla(q, k, v, scale)
    raise ValueError(f"unknown attention impl: {impl!r}")


def mha_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  impl: str = "auto") -> jnp.ndarray:
    """Multi-head attention, q/k/v ``[B, N, H, D]`` -> ``[B, N, H, D]``.

    Folds heads into the batch dimension and reuses the single-head paths —
    on TPU the flash kernel's grid then covers B*H programs.
    """
    B, N, H, D = q.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(B * H, N, D)
    out = spatial_attention(fold(q), fold(k), fold(v), impl=impl)
    return out.reshape(B, H, N, D).transpose(0, 2, 1, 3)
