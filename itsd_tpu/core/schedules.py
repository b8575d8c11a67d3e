"""Diffusion noise schedules — pure functions of (beta_1, beta_T, T).

TPU-native re-design of the schedule buffers the reference registers on its
torch modules (`/root/reference/Diffusion/Diffusion.py:19-65`,
`/root/reference/DiffusionFreeGuidence/DiffusionCondition.py:19-73`):

* ``betas = linspace(beta_1, beta_T, T)`` computed in float64, stored float32
  (the reference stores double buffers but ``extract`` casts to float at use).
* trainer coefficients ``sqrt(alphas_bar)``, ``sqrt(1 - alphas_bar)``.
* sampler coefficients ``coeff1 = sqrt(1/alpha)``,
  ``coeff2 = coeff1 * (1 - alpha) / sqrt(1 - alphas_bar)``, the DDPM posterior
  variance, and the sampler variance table
  ``concat([posterior_var[1:2], betas[1:]])`` (sigma_t^2 = beta_t everywhere
  except the final step, matching `Diffusion.py:76`).

Unlike the reference (buffers pinned to an nn.Module), the schedule here is an
immutable pytree that flows through ``jit`` as a regular argument, so one
compiled ANCESTRAL sampler (`sampling.sample` / the train loss) serves any
(beta_1, beta_T) at the same T. The fast samplers (DDIM/DPM segments,
Picard) build their timestep grids on host at trace time and therefore
need a STATIC schedule — they raise a clear TypeError on a traced one
(`sampling._host_alphas_bar`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DiffusionSchedule:
    """All per-timestep coefficient tables for DDPM training + sampling.

    Every field is a float32 ``[T]`` array. ``T`` is static metadata (it
    determines array shapes, and samplers unroll `lax.scan` over it).
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_bar: jnp.ndarray
    sqrt_alphas_bar: jnp.ndarray
    sqrt_one_minus_alphas_bar: jnp.ndarray
    coeff1: jnp.ndarray
    coeff2: jnp.ndarray
    posterior_var: jnp.ndarray
    # Variance actually used by the ancestral sampler:
    # concat([posterior_var[1:2], betas[1:]]) — reference Diffusion.py:76.
    sampler_var: jnp.ndarray
    T: int = struct.field(pytree_node=False)

    @property
    def num_timesteps(self) -> int:
        return self.T


def linear_schedule(beta_1: float, beta_T: float, T: int) -> DiffusionSchedule:
    """Linear beta schedule, computed in float64 then cast to float32.

    Matches `/root/reference/Diffusion/Diffusion.py:26-35,57-65` numerically.
    """
    betas = np.linspace(beta_1, beta_T, T, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_bar = np.cumprod(alphas, axis=0)
    alphas_bar_prev = np.concatenate([[1.0], alphas_bar[:-1]])

    coeff1 = np.sqrt(1.0 / alphas)
    coeff2 = coeff1 * (1.0 - alphas) / np.sqrt(1.0 - alphas_bar)
    posterior_var = betas * (1.0 - alphas_bar_prev) / (1.0 - alphas_bar)
    sampler_var = np.concatenate([posterior_var[1:2], betas[1:]])

    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas=f32(alphas),
        alphas_bar=f32(alphas_bar),
        sqrt_alphas_bar=f32(np.sqrt(alphas_bar)),
        sqrt_one_minus_alphas_bar=f32(np.sqrt(1.0 - alphas_bar)),
        coeff1=f32(coeff1),
        coeff2=f32(coeff2),
        posterior_var=f32(posterior_var),
        sampler_var=f32(sampler_var),
        T=int(T),
    )


def make_schedule(beta_1: float, beta_T: float, T: int,
                  kind: str = "linear") -> DiffusionSchedule:
    """Schedule factory. The reference only ships the linear schedule; the
    factory keeps the config surface (`beta_1`, `beta_T`, `T`) identical while
    leaving room for cosine etc."""
    if kind == "linear":
        return linear_schedule(beta_1, beta_T, T)
    raise ValueError(f"unknown schedule kind: {kind!r}")
