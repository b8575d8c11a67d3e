"""Optional NaN/Inf checking — the out-of-band replacement for the
reference's per-step device-syncing NaN assert in the sampler hot loop
(`/root/reference/Diffusion/Diffusion.py:100`). Enable per-call; the hot
path stays assertion-free."""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import checkify


def assert_finite(x, name: str = "tensor"):
    """checkify-able finite check; usable inside jitted code when the caller
    wraps with `checkify.checkify`."""
    checkify.check(jnp.isfinite(x).all(), f"nan/inf in {name}")
    return x


def checked(fn):
    """Wrap a jittable fn so it returns (err, out) with NaN checks active."""
    return checkify.checkify(fn, errors=checkify.float_checks)
