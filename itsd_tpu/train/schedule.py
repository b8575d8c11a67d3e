"""Learning-rate schedule: gradual warmup chaining into cosine annealing.

Functional optax re-build of `GradualWarmupScheduler`
(`/root/reference/Scheduler.py:3-31`) composed with torch's
CosineAnnealingLR exactly as the training loops wire them
(`/root/reference/Diffusion/Train.py:577-582`): warmup is *epoch*-granular
(linear from base_lr to multiplier*base_lr over ``warm_epoch`` epochs), then
cosine from multiplier*base_lr to 0 over the remaining epochs.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def warmup_cosine_epochs(base_lr: float, multiplier: float, total_epochs: int,
                         warm_epochs: int, steps_per_epoch: int):
    """Returns an optax-style schedule fn: step -> lr.

    Matches the reference's per-epoch stepping: lr is constant within an
    epoch. ``warm_epochs`` is ``epoch // 10`` in both reference loops.

    Reference semantics (`Scheduler.py:14-21`):
      e <= warm:  lr = base * ((multiplier - 1) * e / warm + 1)
      e >  warm:  lr = cosine(base * multiplier, T_max=total, t=e - warm)
    """
    warm = max(warm_epochs, 1)

    def schedule(step):
        e = jnp.asarray(step, jnp.float32) // steps_per_epoch
        warm_lr = base_lr * ((multiplier - 1.0) * e / warm + 1.0)
        t = e - warm
        cos_lr = (base_lr * multiplier
                  * 0.5 * (1.0 + jnp.cos(math.pi * t / total_epochs)))
        return jnp.where(e <= warm, warm_lr, cos_lr)

    return schedule
