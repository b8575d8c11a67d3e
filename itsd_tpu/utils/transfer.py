"""Host->device transfer helpers.

The TPU relay in this environment bounds individual transfer requests
(~64 MB); a single ``jax.device_put`` of a multi-GB dataset fails or
stalls. ``chunked_device_put`` uploads along axis 0 in bounded pieces and
concatenates on device — used by the device-resident training paths
(classifier fit, artifact trainers) that keep the whole dataset in HBM so
every step gathers its batch by index on device instead of paying a relay
round-trip per step.
"""

from __future__ import annotations


def chunked_device_put(arr, sharding=None, max_bytes: int = 64 << 20):
    """``jax.device_put(arr)`` in <=``max_bytes`` pieces along axis 0.

    ``arr`` is a numpy/jax array with at least 1 dimension. Returns a
    single device array (committed to ``sharding`` when given). For arrays
    already <= ``max_bytes`` this is exactly one ``device_put``.
    """
    import jax
    import jax.numpy as jnp

    row_bytes = max(1, int(arr[0:1].nbytes)) if len(arr) else 1
    rows = max(1, max_bytes // row_bytes)
    if len(arr) <= rows:
        return jax.device_put(arr, sharding)
    parts = [jax.device_put(arr[i:i + rows], sharding)
             for i in range(0, len(arr), rows)]
    return jnp.concatenate(parts, axis=0)
