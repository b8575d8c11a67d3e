"""Device mesh + sharding layer — the SPMD replacement for the reference's
single-process `torch.nn.DataParallel` (`/root/reference/Diffusion/
Train.py:543-554`, device-id parsing at `:406-447`).

Axes
----
* ``data``      — batch sharding for training (DP). Gradients are reduced by
  XLA's all-reduce over ICI — no gather-to-device-0 bottleneck.
* ``model``     — optional tensor parallelism: large kernels are sharded on
  their output-channel axis; XLA inserts the all-gathers/reduce-scatters.
* ``candidate`` — the search-specific axis: noise candidates in
  best-of-N / zero-order / path search shard across chips (the reference
  runs candidates serially on one device — `search_algorithm.py:65`).

The recipe is the scaling-book one: make a mesh, annotate shardings with
NamedSharding/PartitionSpec, let XLA place the collectives on ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(**kwargs) -> bool:
    """Multi-host entry hook: bring up the JAX distributed runtime so
    `jax.devices()` spans every host's chips and `make_mesh` builds a
    global mesh (multi-slice via DCN rides the same API — SURVEY §2.7).

    Activated by ITSD_MULTIHOST=1 (auto-detection on TPU pods) or by
    passing explicit ``coordinator_address``/``num_processes``/
    ``process_id`` kwargs. No-op — returns False — on single-host runs and
    when already initialized, so every entry point can call it
    unconditionally.
    """
    import os

    import sys

    if not (kwargs or os.environ.get("ITSD_MULTIHOST") == "1"):
        return False
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # Only the already-initialized case is benign. A genuine init
        # failure (wrong coordinator address, timeout) must NOT silently
        # degrade each host to an independent single-host run — divergent
        # processes would write conflicting checkpoints.
        if "already initialized" in str(e).lower():
            return False
        print(f"[parallel] jax.distributed.initialize FAILED: {e}",
              file=sys.stderr, flush=True)
        raise
    return True


# --- sequence-parallel mesh registry -------------------------------------
# `model.attention_impl=ring` shards the token axis of every attention op
# over the 'seq' axis of the mesh registered here (kernels/ring_attention).
# A registry rather than a function argument because the attention call
# sits deep inside flax modules whose signatures mirror the reference.
_SEQ_MESH = None


def set_seq_mesh(mesh):
    """Register (or clear, with None) the mesh for sequence-parallel
    attention. The mesh must carry a 'seq' axis; returns the previous
    registration so callers can restore it."""
    global _SEQ_MESH
    if mesh is not None:
        assert "seq" in mesh.axis_names, mesh.axis_names
    prev, _SEQ_MESH = _SEQ_MESH, mesh
    return prev


def get_seq_mesh():
    return _SEQ_MESH


def seq_mesh_scope(mesh):
    """Context manager: register ``mesh`` for the duration of a run and
    RESTORE the previous registration on exit, so entry points cannot leak
    their layout into later runs in the same process (`mesh=None` is a
    no-op scope). The CLI's train/eval/inference paths use this."""
    import contextlib

    @contextlib.contextmanager
    def _scope():
        if mesh is None:
            yield None
            return
        prev = set_seq_mesh(mesh)
        try:
            yield mesh
        finally:
            set_seq_mesh(prev)

    return _scope()


def default_seq_mesh() -> Mesh:
    """data=1 x seq=n over every visible device — the latency-serving
    layout: one sample's token axis spread across the whole slice."""
    return make_mesh((1, len(jax.devices())), ("data", "seq"))


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh over the available devices.

    With default arguments this is a 1-D data mesh over every device. Pass
    ``axis_sizes`` to factor the slice, e.g. ``((4, 2), ("data", "model"))``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [len(devices)] + [1] * (len(axis_names) - 1)
    assert int(np.prod(axis_sizes)) == len(devices), (axis_sizes, len(devices))
    dev_array = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(dev_array, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim of activations."""
    return NamedSharding(mesh, P(axis))


def candidate_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Search candidates use the same physical axis as data parallelism —
    a candidate IS the unit of data in inference-time scaling."""
    return NamedSharding(mesh, P(axis))


def param_sharding(params, mesh: Mesh, model_axis: str = "model"):
    """Tensor-parallel layout: shard the output-channel (last) axis of every
    kernel that divides evenly over the ``model`` axis; replicate the rest.

    Biases/norm scales are tiny — replicated. With model axis size 1 this
    degrades to full replication (pure DP).
    """
    if model_axis in mesh.axis_names:
        msize = mesh.shape[model_axis]
    else:
        msize = 1

    def rule(x):
        if (msize > 1 and hasattr(x, "ndim") and x.ndim >= 2
                and x.shape[-1] % msize == 0 and x.shape[-1] >= 2 * msize):
            spec = [None] * (x.ndim - 1) + [model_axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def spatial_sharding(mesh: Mesh, axis: str = "data",
                     spatial_axis: str = "seq") -> NamedSharding:
    """NHWC activation layout for spatial partitioning: batch over the
    data axis AND image rows (H) over ``spatial_axis``. XLA GSPMD
    partitions every conv spatially (halo exchange for the 3x3 windows
    rides ICI) and reduces GroupNorm statistics across the axis — so
    per-chip activation memory scales down with the axis size. This is
    the second lever on the 256x256 memory wall (the reference's scaling
    wall, `/root/reference/Diffusion/Model.py:152-161`): dp scales
    throughput at fixed per-chip batch; sp shards the IMAGE when even
    batch 1 is too large. Composes with ring attention (same 'seq' axis:
    the H-major token flatten keeps the sharding aligned)."""
    return NamedSharding(mesh, P(axis, spatial_axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data",
                process_local: bool = False,
                spatial_axis: Optional[str] = None):
    """Place a host batch onto the mesh, sharded on the leading dim.

    ``process_local=True`` is the multi-host path: each process passes only
    its LOCAL slice of the global batch (what its data loader produced) and
    the result is a global array of ``process_count * local`` rows — the
    standard per-process data-parallel feed. Works identically (and is
    exercised in the dryrun) with a single process.

    ``spatial_axis`` additionally shards the H dim of image-shaped (4-D)
    leaves over that mesh axis (see `spatial_sharding`); non-image leaves
    (labels) stay batch-sharded only.
    """
    sh = batch_sharding(mesh, axis)

    def sharding_for(x):
        if spatial_axis is not None and getattr(x, "ndim", 0) == 4:
            return spatial_sharding(mesh, axis, spatial_axis)
        return sh

    if process_local:
        def put(x):
            x = np.asarray(x)
            gshape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding_for(x), x, gshape)
        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding_for(x)), batch)
