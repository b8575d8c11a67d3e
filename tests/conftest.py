"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding
is exercised without TPU hardware (the reference has no multi-device test
story at all — its DataParallel wiring is only 'verified' by startup prints,
`/root/reference/Diffusion/Train.py:595-601`).

Note: this environment's TPU plugin calls ``jax.config.update("jax_platforms",
"axon,cpu")`` at interpreter start (sitecustomize), which overrides the
JAX_PLATFORMS env var — so the CPU override must go through jax.config too.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
