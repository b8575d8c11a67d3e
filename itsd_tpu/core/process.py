"""Gaussian diffusion forward/reverse process — pure, key-threaded functions.

Functional re-design of the reference's `GaussianDiffusionTrainer` /
`GaussianDiffusionSampler` method bodies
(`/root/reference/Diffusion/Diffusion.py:37-102`,
`/root/reference/DiffusionFreeGuidence/DiffusionCondition.py:37-105`).
Everything here is shape-polymorphic over the trailing image dims and free of
Python control flow, so it jits/vmaps/shards cleanly.

Conventions
-----------
* Images are NHWC float32 in [-1, 1] (TPU-friendly channels-last; the torch
  reference is NCHW — converters live in `itsd_tpu.data`).
* ``t`` is an int32 ``[B]`` vector of timestep indices.
* Randomness is explicit: callers pass `jax.random` keys.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedules import DiffusionSchedule

# eps_fn(x_t [B,...], t [B]) -> predicted noise [B,...]
EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def extract(v: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep coefficients and reshape to [B, 1, 1, ...] for
    broadcasting. Mirrors `extract` (`Diffusion/Diffusion.py:9-16`) — on TPU
    this lowers to a cheap dynamic-gather, no host sync."""
    out = jnp.take(v, t, axis=0).astype(jnp.float32)
    return out.reshape(t.shape + (1,) * (ndim - 1))


def q_sample(sched: DiffusionSchedule, x_0: jnp.ndarray, t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """Forward process: x_t = sqrt(a_bar_t) x_0 + sqrt(1 - a_bar_t) eps.

    Reference: `Diffusion/Diffusion.py:43-45`.
    """
    nd = x_0.ndim
    return (extract(sched.sqrt_alphas_bar, t, nd) * x_0
            + extract(sched.sqrt_one_minus_alphas_bar, t, nd) * noise)


def diffusion_train_terms(
    sched: DiffusionSchedule, key: jax.Array, x_0: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample (t, noise, x_t) for one training step — Algorithm 1 setup.

    Reference: `Diffusion/Diffusion.py:41-45` (uniform t, gaussian noise).
    """
    t_key, n_key = jax.random.split(key)
    t = jax.random.randint(t_key, (x_0.shape[0],), 0, sched.T, dtype=jnp.int32)
    noise = jax.random.normal(n_key, x_0.shape, x_0.dtype)
    x_t = q_sample(sched, x_0, t, noise)
    return t, noise, x_t


def mse_elementwise(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-element squared error — the reference's `reduction='none'` MSE
    (`Diffusion/Diffusion.py:46`). Callers reduce: uncond uses `.mean()`,
    the CFG loop uses `sum()/B**2` (`TrainCondition.py:89`); both reductions
    are provided by `loss_reduce`."""
    return jnp.square(pred - target)


def snr(sched: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """Per-timestep signal-to-noise ratio SNR_t = alphas_bar_t/(1-alphas_bar_t)."""
    ab = sched.alphas_bar[t]
    return ab / (1.0 - ab)


def min_snr_weight(sched: DiffusionSchedule, t: jnp.ndarray,
                   gamma: float = 5.0) -> jnp.ndarray:
    """Min-SNR-gamma loss weight for eps-prediction (Hang et al. 2023,
    arXiv 2303.09556): w_t = min(SNR_t, gamma) / SNR_t.

    Down-weights the easy low-t (high-SNR) timesteps so training effort
    concentrates where it moves sample quality; w_t == 1 wherever
    SNR_t <= gamma (i.e. most of a T=1000 linear-beta chain). Training
    improvement beyond the reference (which uses unweighted MSE,
    `Diffusion/Diffusion.py:46`)."""
    s = snr(sched, t)
    return jnp.minimum(s, gamma) / s


def loss_reduce(loss: jnp.ndarray, mode: str = "mean") -> jnp.ndarray:
    """Reduce an elementwise loss. ``mode='mean'`` matches the unconditional
    loop (`Train.py:694`); ``mode='sum_div_b2'`` matches the CFG loop's
    `loss.sum() / b ** 2` quirk (`TrainCondition.py:89`)."""
    if mode == "mean":
        return loss.mean()
    if mode == "sum_div_b2":
        b = loss.shape[0]
        return loss.sum() / (b * b)
    raise ValueError(f"unknown loss reduction: {mode!r}")


def predict_prev_mean_from_eps(sched: DiffusionSchedule, x_t: jnp.ndarray,
                               t: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """mu_theta(x_t, t) = coeff1_t * x_t - coeff2_t * eps.

    Reference: `Diffusion/Diffusion.py:67-72`.
    """
    nd = x_t.ndim
    return (extract(sched.coeff1, t, nd) * x_t
            - extract(sched.coeff2, t, nd) * eps)


def p_mean_variance(sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray,
                    eps: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean and the sampler's variance table value.

    Reference: `Diffusion/Diffusion.py:74-82` (the eps prediction is taken as
    an argument here so model evaluation stays outside the math core).
    """
    var = extract(sched.sampler_var, t, x_t.ndim)
    mean = predict_prev_mean_from_eps(sched, x_t, t, eps)
    return mean, var


def p_sample_step(sched: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray,
                  eps: jnp.ndarray, noise: jnp.ndarray, *,
                  clip_x0: bool = False) -> jnp.ndarray:
    """One reverse step: x_{t-1} = mu + sqrt(var) * noise, noiseless at t=0.

    The reference branches in Python (`Diffusion.py:95-99`); here the t==0
    case is a `where` mask so the step stays trace-friendly inside scan.

    ``clip_x0`` clips the implied x_0-hat to [-1, 1] before the posterior
    mean (the standard `clip_denoised` stabiliser the reference lacks):
    extrapolative CFG (w>0) on long chains can otherwise blow the state up
    without bound — each step's 1/sqrt(alpha) gain compounds. With clipping
    the chain is bounded for ANY weights. Off by default: the unclipped
    step is what the torch-parity tests pin down.
    """
    if clip_x0:
        nd = x_t.ndim
        x0 = jnp.clip(predict_x0_from_eps(sched, x_t, t, eps), -1.0, 1.0)
        # re-derive the eps consistent with the clipped x0-hat; the mean
        # formula below is then exactly the posterior mean around it
        eps = ((x_t - extract(sched.sqrt_alphas_bar, t, nd) * x0)
               / extract(sched.sqrt_one_minus_alphas_bar, t, nd))
    mean, var = p_mean_variance(sched, x_t, t, eps)
    nonzero = (t > 0).astype(x_t.dtype).reshape(t.shape + (1,) * (x_t.ndim - 1))
    return mean + nonzero * jnp.sqrt(var) * noise


def predict_x0_from_eps(sched: DiffusionSchedule, x_t: jnp.ndarray,
                        t: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """x_0-hat = (x_t - sqrt(1-a_bar) eps) / sqrt(a_bar). Used by verifiers to
    score intermediate states during path search (paper Section "search over
    paths"; the reference never implemented it — `search_algorithm.py:307-312`
    is a placeholder)."""
    nd = x_t.ndim
    return ((x_t - extract(sched.sqrt_one_minus_alphas_bar, t, nd) * eps)
            / extract(sched.sqrt_alphas_bar, t, nd))


def cfg_combine(eps_cond: jnp.ndarray, eps_uncond: jnp.ndarray,
                w: float) -> jnp.ndarray:
    """Classifier-free-guidance mix: (1+w)*eps_cond - w*eps_uncond.

    Reference: `DiffusionFreeGuidence/DiffusionCondition.py:85`.
    """
    return (1.0 + w) * eps_cond - w * eps_uncond


def _validate_interval(interval) -> None:
    """Fail fast on REVERSED concrete guidance intervals at build time:
    lo > hi would silently disable guidance for the whole chain
    (never-active lax.cond branch) and look like plain unguided sampling.
    An EMPTY interval (lo == hi) stays legal — sweeps use it as the
    explicit "guidance off" arm (see cfg_nfes). Traced scalars skip the
    check (their values are unknown until runtime by design)."""
    if interval is None:
        return
    try:
        lo_c, hi_c = int(interval[0]), int(interval[1])
    except (TypeError, jax.errors.TracerIntegerConversionError,
            jax.errors.ConcretizationTypeError):
        return  # tracer(s): values unknowable here — sweep programs own this
    if lo_c > hi_c:
        raise ValueError(
            f"cfg interval (lo={lo_c}, hi={hi_c}) is reversed: "
            "guidance would never activate; want lo <= hi "
            "(lo == hi means guidance off)")


def _tile_labels(labels: jnp.ndarray, batch: int) -> jnp.ndarray:
    """Search folds the candidate axis into the batch (N*B rows); labels
    are per-batch-position [B], so tile them across the fold."""
    if batch == labels.shape[0]:
        return labels
    assert batch % labels.shape[0] == 0, (
        f"batch {batch} not a multiple of labels {labels.shape[0]}")
    return jnp.tile(labels, batch // labels.shape[0])


def make_cfg_eps_fn(model_eps_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray],
                    labels: jnp.ndarray, w: float,
                    interval: Optional[Tuple[int, int]] = None) -> EpsFn:
    """Build a guided eps_fn from a conditional model.

    TPU-first: instead of the reference's two sequential model calls per step
    (`DiffusionCondition.py:83-84`), we run ONE dual-batched forward —
    concat([x, x]) with [labels, null-labels] — which keeps the MXU fed with a
    2x larger matmul instead of two half-size launches.

    ``interval=(lo, hi)`` restricts guidance to timesteps ``lo <= t < hi``
    (Kynkaanniemi et al. 2024, "Applying guidance in a limited interval"):
    outside it the step runs ONE conditional forward (w -> 0 limit), under
    `lax.cond` so the untaken dual-batch branch costs nothing at runtime —
    both a quality knob (full-range CFG over-sharpens the high-noise tail)
    and an NFE saving (`cfg_nfes` accounts it). Relies on the sampler
    contract that ``t`` is batch-constant within a step (true of every
    sampler here: ancestral/DDIM/DPM/segments all broadcast a scalar step).
    """
    _validate_interval(interval)

    def dual(x_t: jnp.ndarray, t: jnp.ndarray, lab: jnp.ndarray):
        x2 = jnp.concatenate([x_t, x_t], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        lab2 = jnp.concatenate([lab, jnp.zeros_like(lab)], axis=0)
        eps2 = model_eps_fn(x2, t2, lab2)
        eps_c, eps_u = jnp.split(eps2, 2, axis=0)
        return cfg_combine(eps_c, eps_u, w)

    def eps_fn(x_t: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        lab = _tile_labels(labels, x_t.shape[0])
        if interval is None:
            return dual(x_t, t, lab)
        # lo/hi (and w) may be TRACED scalars: a sweep over guidance
        # intervals/strengths then shares ONE compiled program instead of
        # recompiling the whole T-step chain per arm (the cond structure is
        # interval-independent). Static Python ints behave identically.
        lo, hi = interval[0], interval[1]
        active = jnp.logical_and(t.reshape(-1)[0] >= lo,
                                 t.reshape(-1)[0] < hi)
        return jax.lax.cond(
            active,
            lambda x: dual(x, t, lab),
            lambda x: model_eps_fn(x, t, lab),
            x_t)
    return eps_fn


def make_autoguidance_eps_fn(
        strong_eps_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray],
                                jnp.ndarray],
        weak_eps_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray],
                              jnp.ndarray],
        labels: jnp.ndarray, w: float,
        interval: Optional[Tuple[int, int]] = None) -> EpsFn:
    """Autoguidance (Karras et al. 2024, "Guiding a Diffusion Model with a
    Bad Version of Itself", arXiv 2406.02507): guide a strong CONDITIONAL
    model against a weak/under-trained variant of itself —
    ``(1+w)*eps_strong - w*eps_weak`` with BOTH forwards conditioned on
    the same labels. Where CFG's guiding direction subtracts the
    unconditional score (entangling class control with quality),
    autoguidance subtracts the weak model's *errors*: the weak model
    makes the same mistakes, amplified, so extrapolating away from it
    cleans quality without over-sharpening class control.

    Cost matches CFG (2 model evals per guided step — `cfg_nfes` applies),
    but the two forwards carry DIFFERENT params, so they cannot be
    dual-batched into one MXU launch the way `make_cfg_eps_fn` folds its
    cond/uncond pair; XLA still overlaps them within a step.
    ``interval=(lo, hi)`` restricts guidance exactly as in
    `make_cfg_eps_fn` (single strong forward outside it).

    The reference has no counterpart (its guidance is fixed full-range
    CFG, `DiffusionFreeGuidence/DiffusionCondition.py:79-87`); this is a
    beyond-the-paper inference-time quality axis alongside restart/SMC.
    """
    _validate_interval(interval)

    def guided(x_t: jnp.ndarray, t: jnp.ndarray,
               lab: jnp.ndarray) -> jnp.ndarray:
        return cfg_combine(strong_eps_fn(x_t, t, lab),
                           weak_eps_fn(x_t, t, lab), w)

    def eps_fn(x_t: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        lab = _tile_labels(labels, x_t.shape[0])
        if interval is None:
            return guided(x_t, t, lab)
        lo, hi = interval[0], interval[1]
        active = jnp.logical_and(t.reshape(-1)[0] >= lo,
                                 t.reshape(-1)[0] < hi)
        return jax.lax.cond(
            active,
            lambda x: guided(x, t, lab),
            lambda x: strong_eps_fn(x, t, lab),
            x_t)
    return eps_fn


def cfg_nfes(T: int, interval: Optional[Tuple[int, int]] = None) -> int:
    """Model evals per image for a T-step guided chain: 2 per step inside
    the guidance interval, 1 outside (2T for full-range CFG)."""
    if interval is None:
        return 2 * T
    lo, hi = int(interval[0]), int(interval[1])
    return T + max(0, min(hi, T) - max(lo, 0))
