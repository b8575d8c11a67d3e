"""Inference-time scaling: search over initial noise — TPU-native.

Re-design of `/root/reference/search/search_algorithm.py`. The reference
evaluates candidates **serially** in Python (`:65`, `:156-207`, `:305-334`)
and syncs to host for every score. Here every search is a single jitted
program:

* the candidate axis is a leading array dimension — candidates denoise as
  one big batch (vmap-free: batch folding keeps the MXU fed) and shard over
  the mesh's ``data`` axis across chips;
* argmax / pivot updates / top-k selection are `lax` ops on device;
* iteration loops are `lax.scan` with the pivot as carry.

Four algorithms, matching the reference surface:
  random_search      — C10 (`search_algorithm.py:18-87`)
  zero_order_search  — C11 (`:90-235`), plus a norm-preserving "shell" mode
                       fixing the drift defect noted in SURVEY §2.8
  path_search        — C12 (`:238-340`): implemented **for real** (the
                       reference's noise injection is an acknowledged
                       placeholder, `:307-312`): fork/renoise/filter over
                       the denoising trajectory, paper Section "Search over
                       Paths"
  gradient_search    — C12b (`:343-438`): Adam on the noise through a
                       rematerialised sampler (the reference backprops
                       through all T steps with O(T) activation memory)

Beyond the reference surface (the paper's NFE-allocation thesis, which its
placeholder search couldn't express):
  pruned_search      — successive halving over noise (top-k narrows)
  smc_search         — Feynman–Kac steering: weighted particle population
                       with ESS-gated systematic resampling

NFE accounting is returned as metadata (the reference mutates a counter).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..core.process import EpsFn, predict_x0_from_eps
from ..core.sampling import (denoise_segment, make_segment_denoiser,
                             renoise, sample)
from ..core.schedules import DiffusionSchedule

# denoise_fn(noise [B,...], key) -> images [B,...]
DenoiseFn = Callable[[jnp.ndarray, jax.Array], jnp.ndarray]
# verifier_fn(images [B,...]) -> scalar score (higher is better)
VerifierFn = Callable[[jnp.ndarray], jnp.ndarray]


def _nan_to_neg_inf(scores: jnp.ndarray) -> jnp.ndarray:
    """NaN-safe selection: jnp.argmax / lax.top_k treat NaN as the maximum,
    so one NaN-scoring candidate (e.g. bf16 overflow) would beat every
    finite one. Mask NaN to -inf before any selection."""
    return jnp.where(jnp.isnan(scores), -jnp.inf, scores)


@dataclasses.dataclass
class SearchResult:
    best_noise: jnp.ndarray
    best_score: jnp.ndarray
    best_images: Optional[jnp.ndarray]
    history: dict
    nfes: int  # number of full denoising runs (x T model evals; x2 for CFG)


def _denoise_candidates(denoise_fn: DenoiseFn, noises: jnp.ndarray,
                        key: jax.Array, sharding=None) -> jnp.ndarray:
    """[N, B, ...] candidate noises -> [N, B, ...] images via ONE batched
    sampler call (candidates folded into the batch axis). With a
    `NamedSharding`, the folded candidate axis is constrained onto the mesh
    so each chip denoises its shard of candidates — the SPMD replacement for
    the reference's serial candidate loop."""
    n, b = noises.shape[:2]
    flat = noises.reshape((n * b,) + noises.shape[2:])
    if sharding is not None:
        flat = jax.lax.with_sharding_constraint(flat, sharding)
    images = denoise_fn(flat, key)
    return images.reshape((n, b) + images.shape[1:])


def random_search(
    key: jax.Array,
    noise_shape: Tuple[int, ...],
    denoise_fn: DenoiseFn,
    verifier_fn: VerifierFn,
    n_candidates: int = 4,
    return_images: bool = True,
    sharding=None,
) -> SearchResult:
    """Best-of-N over i.i.d. initial noises.

    `noise_shape` is the per-candidate batch shape (B, H, W, C), matching the
    reference's convention that one candidate = one batch
    (`search_algorithm.py:54-82`). Pass a `NamedSharding` (e.g.
    `parallel.candidate_sharding(mesh)`) to spread candidates over chips.
    """
    knoise, kden = jax.random.split(key)
    noises = jax.random.normal(knoise, (n_candidates,) + tuple(noise_shape))
    images = _denoise_candidates(denoise_fn, noises, kden, sharding)
    scores = jax.vmap(verifier_fn)(images)
    best = jnp.argmax(_nan_to_neg_inf(scores))
    return SearchResult(
        best_noise=noises[best],
        best_score=scores[best],
        best_images=images[best] if return_images else None,
        history={"scores": scores},
        nfes=n_candidates,
    )


def _sample_neighbors(key: jax.Array, pivot: jnp.ndarray, n_neighbors: int,
                      lambda_radius: float, mode: str) -> jnp.ndarray:
    eps = jax.random.normal(key, (n_neighbors,) + pivot.shape)
    if mode == "additive":
        # Reference behaviour: pivot + eps * (1 - lambda)
        # (`search_algorithm.py:223-229`). Drifts off the Gaussian shell
        # over many iterations.
        return pivot[None] + eps * (1.0 - lambda_radius)
    if mode == "shell":
        # Norm-preserving interpolation: lambda * pivot + sqrt(1-lambda^2) * eps
        # keeps candidates distributed like N(0, I).
        return (lambda_radius * pivot[None]
                + jnp.sqrt(1.0 - lambda_radius ** 2) * eps)
    raise ValueError(f"unknown neighbor mode: {mode!r}")


def zero_order_search(
    key: jax.Array,
    initial_noise: jnp.ndarray,
    denoise_fn: DenoiseFn,
    verifier_fn: VerifierFn,
    n_neighbors: int = 4,
    lambda_radius: float = 0.95,
    n_iterations: int = 10,
    neighbor_mode: str = "additive",
    return_images: bool = False,
    sharding=None,
) -> SearchResult:
    """Pivot-based local search in noise space (reference C11).

    The whole optimisation is one `lax.scan`: per iteration, all neighbors
    denoise as a single batch and the pivot update is an on-device argmax —
    no per-candidate host syncs.
    """
    shape = initial_noise.shape

    def iteration(carry, it_key):
        pivot, best_noise, best_score = carry
        nk, dk = jax.random.split(it_key)
        neighbors = _sample_neighbors(nk, pivot, n_neighbors, lambda_radius,
                                      neighbor_mode)
        images = _denoise_candidates(denoise_fn, neighbors, dk, sharding)
        scores = jax.vmap(verifier_fn)(images)
        i = jnp.argmax(_nan_to_neg_inf(scores))
        it_best_score = scores[i]
        it_best = neighbors[i]
        improved = it_best_score > best_score
        best_score = jnp.where(improved, it_best_score, best_score)
        pick = lambda a, b: jnp.where(improved, a, b)
        best_noise = pick(it_best, best_noise)
        pivot = pick(it_best, pivot)  # pivot moves only on improvement (:193-196)
        return (pivot, best_noise, best_score), scores

    keys = jax.random.split(key, n_iterations)
    init = (initial_noise, initial_noise, jnp.asarray(-jnp.inf))
    (pivot, best_noise, best_score), score_hist = lax.scan(
        iteration, init, keys)

    result_images = None
    if return_images:
        result_images = denoise_fn(best_noise, jax.random.fold_in(key, 1))
    return SearchResult(
        best_noise=best_noise,
        best_score=best_score,
        best_images=result_images,
        history={"scores": score_hist,      # [n_iterations, n_neighbors]
                 "candidates_per_iter": n_neighbors},
        nfes=n_iterations * n_neighbors + (1 if return_images else 0),
    )


def path_search_nfes(T: int, n_paths: int,
                     injection_steps: Sequence[int],
                     delta_f: int, seg_cost=None) -> int:
    """Static NFE accounting for `path_search` (full-denoise equivalents),
    mirroring its in-trace accumulation — callers that jit the search and
    return only arrays use this instead of re-deriving (and overstating)
    the cost.

    ``seg_cost(t_from, t_to)`` is the per-segment model-eval count — pass
    the second element of `make_segment_denoiser` when the search forks
    over DDIM/DPM segments; the default is the ancestral cost
    ``t_from - t_to``, which OVERSTATES NFE ~``T/num_steps``-fold for
    fast-segment runs."""
    if seg_cost is None:
        seg_cost = lambda hi, lo: hi - lo
    steps = sorted(set(int(s) for s in injection_steps), reverse=True)
    t_prev, nfes = T, 0.0
    for t_inj in steps:
        nfes += n_paths * seg_cost(t_prev, t_inj) / T  # denoise to injection
        nfes += n_paths / T                      # x0-hat scoring eval
        t_prev = min(t_inj + delta_f, T)
    nfes += n_paths * seg_cost(t_prev, 0) / T    # final descent
    return int(round(nfes))


def path_search(
    key: jax.Array,
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    verifier_fn: VerifierFn,
    noise_shape: Tuple[int, ...],
    n_paths: int = 4,
    n_active: int = 2,
    injection_steps: Sequence[int] = (400,),
    delta_f: int = 50,
    return_images: bool = True,
    sharding=None,
    clip_denoised: bool = False,
    segment=None,
) -> SearchResult:
    """Search over paths (paper §"beyond scaling denoising steps"; reference
    C12 intended this but ships a placeholder, `search_algorithm.py:305-334`).

    ``clip_denoised`` applies the per-step x0-hat clamp inside every
    denoise segment — must match the sampler the winner will be compared
    against (the guard baseline uses the same flag), and is required for
    long extrapolative-CFG chains in bf16.

    Real trajectory forking:
      1. ``n_paths`` i.i.d. initial noises denoise from T down to the first
         injection step t_i.
      2. At each injection step: score each path's predicted x0-hat, keep the
         ``n_active`` best (`lax.top_k`), then *expand* each survivor into
         ``n_paths // n_active`` copies renoised forward by ``delta_f`` steps
         (fresh noise => the paths genuinely fork), and denoise back down to
         the next injection step.
      3. After the last injection step, denoise to 0 and return the best.

    All injection steps are static, so the whole search compiles to a fixed
    pipeline of scan segments; selection is on-device top-k.
    """
    assert n_paths % n_active == 0 and n_paths >= n_active
    # ``segment`` = (denoise_seg, cost) from `make_segment_denoiser`: lets
    # the forking search ride the fast samplers (DDIM/DPM segments) — the
    # Axis-3 result (best-of-N over few-step candidates dominates at fixed
    # NFE) applied to path search. Default: ancestral, exact as before.
    if segment is None:
        segment = make_segment_denoiser(sched, eps_fn, "ddpm",
                                        clip_denoised=clip_denoised)
    seg_fn, seg_cost = segment
    expand = n_paths // n_active
    steps = sorted(set(int(s) for s in injection_steps), reverse=True)
    assert all(0 < s < sched.T for s in steps)

    noise_shape = tuple(noise_shape)
    k0, key = jax.random.split(key)
    # Paths folded into the batch axis: x is always [n_paths * B, H, W, C].
    # With a NamedSharding, the folded axis is constrained onto the mesh so
    # each chip carries its shard of the path population (SURVEY §3.3).
    shard = (lambda a: jax.lax.with_sharding_constraint(a, sharding)
             if sharding is not None else a)
    x = jax.random.normal(k0, (n_paths,) + noise_shape)
    x = shard(x.reshape((-1,) + noise_shape[1:]))
    per_path = lambda a: a.reshape((n_paths,) + noise_shape)

    score_log = []
    t_prev = sched.T
    nfes = 0.0
    for t_inj in steps:
        kd, ks, key = jax.random.split(key, 3)
        # Denoise all paths down to the injection point (one batched scan).
        x = seg_fn(x, kd, t_prev, t_inj)
        nfes += n_paths * seg_cost(t_prev, t_inj) / sched.T
        # Score the predicted clean image x0-hat at the current noise level
        # (one extra model eval per path — far cheaper than denoising to 0).
        tb = jnp.full((x.shape[0],), t_inj - 1, dtype=jnp.int32)
        eps = eps_fn(x, tb)
        x0_hat = jnp.clip(predict_x0_from_eps(sched, x, tb, eps), -1, 1)
        scores = jax.vmap(verifier_fn)(per_path(x0_hat))
        score_log.append(scores)
        nfes += n_paths / sched.T
        # Keep top n_active paths; expand each into `expand` renoised copies.
        _, top_idx = lax.top_k(_nan_to_neg_inf(scores), n_active)
        survivors = per_path(x)[top_idx]                  # [n_active, B, ...]
        tiled = jnp.repeat(survivors, expand, axis=0)     # [n_paths, B, ...]
        t_prev = min(t_inj + delta_f, sched.T)
        x = renoise(sched, shard(tiled.reshape((-1,) + noise_shape[1:])),
                    t_inj, t_prev, ks)

    kf, _ = jax.random.split(key)
    x = seg_fn(x, kf, t_prev, 0, clip_output=True)
    nfes += n_paths * seg_cost(t_prev, 0) / sched.T
    finals = per_path(x)
    final_scores = jax.vmap(verifier_fn)(finals)
    best = jnp.argmax(_nan_to_neg_inf(final_scores))
    return SearchResult(
        best_noise=finals[best],  # final sample of the winning path
        best_score=final_scores[best],
        best_images=finals[best] if return_images else None,
        history={"scores": jnp.stack(score_log) if score_log else None,
                 "final_scores": final_scores,
                 "injection_points": steps},
        nfes=int(round(nfes)),
    )


def pruned_search_nfes(T: int, n_candidates: int,
                       prune_schedule: Sequence[Sequence[int]],
                       seg_cost=None) -> int:
    """Static NFE accounting for `pruned_search` (full-denoise units).
    See `path_search_nfes` for the ``seg_cost`` caveat — the ancestral
    default overstates NFE for fast-segment runs."""
    if seg_cost is None:
        seg_cost = lambda hi, lo: hi - lo
    t_prev, n_now, nfes = T, n_candidates, 0.0
    for t_p, keep in sorted((tuple(map(int, p)) for p in prune_schedule),
                            reverse=True):
        nfes += n_now * seg_cost(t_prev, t_p) / T  # denoise to prune point
        nfes += n_now / T                    # x0-hat scoring eval
        t_prev, n_now = t_p, keep
    nfes += n_now * seg_cost(t_prev, 0) / T  # survivors' final descent
    return int(round(nfes))


def pruned_search(
    key: jax.Array,
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    verifier_fn: VerifierFn,
    noise_shape: Tuple[int, ...],
    n_candidates: int = 16,
    prune_schedule: Sequence[Sequence[int]] = ((500, 4),),
    return_images: bool = True,
    sharding=None,
    clip_denoised: bool = False,
    segment=None,
) -> SearchResult:
    """Progressive candidate pruning — successive halving over noise.

    Best-of-N spends ``N * T`` evals; most of that budget denoises
    candidates that were already visibly losing early in the chain. This
    narrows instead: start ``n_candidates`` i.i.d. noises, denoise them
    *together* (candidates folded into the batch axis), and at each
    ``(t, keep)`` point of ``prune_schedule`` score every candidate's
    predicted x0-hat (one extra model eval) and keep the ``keep`` best
    (`lax.top_k` on device). Survivors finish to t=0.

    Complements `path_search` (which *forks* upward at its injection
    points): pruning only narrows, so the trajectory distribution is
    untouched — a pruned winner is a true ancestral sample, making this
    safe for quality-sensitive serving. Each segment has static shapes, so
    the whole search compiles to a fixed pipeline of scan segments.

    Beyond the reference (its placeholder search couldn't express this —
    `search_algorithm.py:305-334`); in the spirit of the paper's
    "allocate NFE to the search axis" thesis.
    """
    sched_pairs = sorted((tuple(map(int, p)) for p in prune_schedule),
                         reverse=True)
    seen_t = [t for t, _ in sched_pairs]
    if len(set(seen_t)) != len(seen_t):
        raise ValueError(
            f"prune_schedule has duplicate timesteps: {sched_pairs} — "
            "merge them into one (t, keep) entry")
    n_now = int(n_candidates)
    for t_p, keep in sched_pairs:
        assert 0 < t_p < sched.T, (t_p, sched.T)
        assert 0 < keep <= n_now, (
            f"prune_schedule keep={keep} must be in (0, {n_now}]")
        n_now = keep

    noise_shape = tuple(noise_shape)
    # fast-sampler segments: see path_search (same (fn, cost) contract)
    if segment is None:
        segment = make_segment_denoiser(sched, eps_fn, "ddpm",
                                        clip_denoised=clip_denoised)
    seg_fn, seg_cost = segment
    eval_units = 0.0

    def shard(a):
        # constrain the folded candidate axis onto the mesh only while it
        # still divides the device count — pruning shrinks the population,
        # and a non-divisible constraint is a compile error
        if sharding is None:
            return a
        n_dev = getattr(getattr(sharding, "mesh", None), "size", 0)
        if n_dev and a.shape[0] % n_dev:
            return a
        return jax.lax.with_sharding_constraint(a, sharding)

    k0, key = jax.random.split(key)
    n_now = int(n_candidates)
    x = jax.random.normal(k0, (n_now,) + noise_shape)
    x = shard(x.reshape((-1,) + noise_shape[1:]))
    per_cand = lambda a, n: a.reshape((n,) + noise_shape)

    score_log = []
    t_prev = sched.T
    for t_p, keep in sched_pairs:
        kd, key = jax.random.split(key)
        x = seg_fn(x, kd, t_prev, t_p)
        eval_units += n_now * (seg_cost(t_prev, t_p) + 1) / sched.T
        tb = jnp.full((x.shape[0],), t_p - 1, dtype=jnp.int32)
        eps = eps_fn(x, tb)
        x0_hat = jnp.clip(predict_x0_from_eps(sched, x, tb, eps), -1, 1)
        scores = jax.vmap(verifier_fn)(per_cand(x0_hat, n_now))
        score_log.append(scores)
        _, top_idx = lax.top_k(_nan_to_neg_inf(scores), keep)
        x = per_cand(x, n_now)[top_idx]
        n_now = keep
        x = shard(x.reshape((-1,) + noise_shape[1:]))
        t_prev = t_p

    kf, _ = jax.random.split(key)
    x = seg_fn(x, kf, t_prev, 0, clip_output=True)
    eval_units += n_now * seg_cost(t_prev, 0) / sched.T
    finals = per_cand(x, n_now)
    final_scores = jax.vmap(verifier_fn)(finals)
    best = jnp.argmax(_nan_to_neg_inf(final_scores))
    return SearchResult(
        best_noise=finals[best],
        best_score=final_scores[best],
        best_images=finals[best] if return_images else None,
        history={"prune_scores": score_log,
                 "final_scores": final_scores,
                 "prune_schedule": sched_pairs},
        nfes=int(round(eval_units)),
    )


def smc_search_nfes(T: int, n_particles: int,
                    resample_steps: Sequence[int], seg_cost=None) -> int:
    """Static NFE accounting for `smc_search` (full-denoise units).
    See `path_search_nfes` for the ``seg_cost`` caveat — the ancestral
    default overstates NFE for fast-segment runs."""
    if seg_cost is None:
        seg_cost = lambda hi, lo: hi - lo
    steps = sorted(set(int(s) for s in resample_steps), reverse=True)
    t_prev, nfes = T, 0.0
    for t_r in steps:
        nfes += n_particles * (seg_cost(t_prev, t_r) + 1) / T
        t_prev = t_r
    nfes += n_particles * seg_cost(t_prev, 0) / T
    return int(round(nfes))


def _systematic_resample(key: jax.Array, log_w: jnp.ndarray) -> jnp.ndarray:
    """Systematic (low-variance) resampling: ONE uniform draw stratifies the
    whole population — each particle i is kept ``floor(N*w_i)`` or
    ``ceil(N*w_i)`` times, never more variable than that. Static shapes,
    on-device (`searchsorted` over the cumulative weights)."""
    n = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    positions = (jax.random.uniform(key, ()) + jnp.arange(n)) / n
    idx = jnp.searchsorted(jnp.cumsum(w), positions)
    return jnp.clip(idx, 0, n - 1)


def smc_search(
    key: jax.Array,
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    verifier_fn: VerifierFn,
    noise_shape: Tuple[int, ...],
    n_particles: int = 16,
    resample_steps: Sequence[int] = (700, 400, 150),
    lambda_temp: float = 10.0,
    ess_threshold: float = 0.5,
    return_images: bool = True,
    sharding=None,
    clip_denoised: bool = False,
    segment=None,
    return_population: bool = False,
    lambda_scale: str = "absolute",
) -> SearchResult:
    """Sequential-Monte-Carlo steering over the denoising trajectory
    (Feynman–Kac steering, Singhal et al. 2025) — a principled successor to
    greedy `path_search`/`pruned_search`, beyond the reference's surface
    (its search module is a placeholder, `search_algorithm.py:305-334`).

    ``n_particles`` i.i.d. noises denoise *together* (particles folded into
    the batch axis, sharded over the mesh like every other search). At each
    static ``resample_steps`` point the predicted x0-hat is scored (one
    extra model eval per particle) and the particle population carries
    log-weights with **difference potentials**:

        log w_i += lambda_temp * (score_i(t_k) - score_i(t_{k-1}))

    which telescope to ``lambda_temp * score(final)`` — the target tilted
    distribution ``p(x) * exp(lambda * verifier(x))``. When the effective
    sample size drops below ``ess_threshold * N``, the population is
    systematically resampled (low-variance, one uniform draw) and weights
    reset; duplicated particles diverge again immediately because the
    ancestral noise downstream is drawn per-row. Unlike top-k pruning this
    keeps the population size constant and resamples *proportionally* —
    weak particles die, strong ones multiply, and the temperature
    ``lambda_temp`` interpolates from untilted sampling (0) to greedy
    selection (→∞).

    ESS gating is an on-device `where` (not `lax.cond`): both index sets
    have static shape, so the whole search stays one fixed pipeline of scan
    segments like `pruned_search`.

    ``lambda_scale`` addresses the measured failure mode of absolute
    temperatures (docs/results/smc_budget.json: with classifier scores
    spanning ~40 nats, even lambda=2 makes the checkpoint softmax one-hot
    — ESS→1, full population collapse). With ``"spread"`` each
    checkpoint's difference potential is divided by the population
    standard deviation of the increments, so ``lambda_temp`` is
    *dimensionless selection pressure* (weights = softmax of
    lambda·z-scores) and transfers across verifiers unchanged. The
    telescoping identity to ``exp(lambda·score(final))`` no longer holds
    exactly — spread mode is adaptive-temperature annealing toward the
    verifier, traded for scale-freeness.
    """
    if lambda_scale not in ("absolute", "spread"):
        raise ValueError(f"lambda_scale must be 'absolute' or 'spread', "
                         f"got {lambda_scale!r}")
    steps = sorted(set(int(s) for s in resample_steps), reverse=True)
    if not steps:
        raise ValueError("smc_search needs >=1 resample step — with none "
                         "it degenerates to best-of-N (use random_search)")
    assert all(0 < s < sched.T for s in steps)
    n = int(n_particles)
    noise_shape = tuple(noise_shape)
    if segment is None:
        segment = make_segment_denoiser(sched, eps_fn, "ddpm",
                                        clip_denoised=clip_denoised)
    seg_fn, seg_cost = segment

    def shard(a):
        return (jax.lax.with_sharding_constraint(a, sharding)
                if sharding is not None else a)

    per_particle = lambda a: a.reshape((n,) + noise_shape)

    k0, key = jax.random.split(key)
    x = jax.random.normal(k0, (n,) + noise_shape)
    x = shard(x.reshape((-1,) + noise_shape[1:]))
    log_w = jnp.zeros((n,))
    prev_score = jnp.zeros((n,))

    score_log, ess_log, resampled_log = [], [], []
    t_prev = sched.T
    nfes = 0.0
    for t_r in steps:
        kd, kr, key = jax.random.split(key, 3)
        x = seg_fn(x, kd, t_prev, t_r)
        nfes += n * seg_cost(t_prev, t_r) / sched.T
        tb = jnp.full((x.shape[0],), t_r - 1, dtype=jnp.int32)
        eps = eps_fn(x, tb)
        x0_hat = jnp.clip(predict_x0_from_eps(sched, x, tb, eps), -1, 1)
        scores = _nan_to_neg_inf(jax.vmap(verifier_fn)(per_particle(x0_hat)))
        nfes += n / sched.T
        score_log.append(scores)
        # difference potential; a -inf (NaN-masked) score zeroes the weight
        d = scores - prev_score
        if lambda_scale == "spread":
            # z-score the increments over the FINITE population so the
            # temperature is dimensionless; -inf stays -inf through the
            # division, and a degenerate all-equal population divides by
            # ~eps only in the numerator-0 case (weights stay uniform).
            fin = jnp.isfinite(d)
            cnt = jnp.maximum(jnp.sum(fin), 1)
            mu = jnp.sum(jnp.where(fin, d, 0.0)) / cnt
            sd = jnp.sqrt(jnp.sum(jnp.where(fin, (d - mu) ** 2, 0.0)) / cnt)
            d = d / (sd + 1e-6)
        log_w = log_w + lambda_temp * d
        finite = jnp.isfinite(log_w)
        log_w = jnp.where(finite, log_w, -jnp.inf)
        # every particle NaN'd out -> no signal: keep uniform weights
        # rather than a NaN softmax/ESS
        log_w = jnp.where(jnp.any(finite), log_w, jnp.zeros_like(log_w))
        w = jax.nn.softmax(log_w)
        ess = 1.0 / jnp.sum(w * w)
        ess_log.append(ess)
        do_resample = ess < ess_threshold * n
        resampled_log.append(do_resample)
        idx = jnp.where(do_resample,
                        _systematic_resample(kr, log_w), jnp.arange(n))
        x = shard(per_particle(x)[idx].reshape((-1,) + noise_shape[1:]))
        prev_score = scores[idx]
        log_w = jnp.where(do_resample, jnp.zeros_like(log_w), log_w[idx])
        t_prev = t_r

    kf, _ = jax.random.split(key)
    x = seg_fn(x, kf, t_prev, 0, clip_output=True)
    nfes += n * seg_cost(t_prev, 0) / sched.T
    finals = per_particle(x)
    final_scores = jax.vmap(verifier_fn)(finals)
    best = jnp.argmax(_nan_to_neg_inf(final_scores))
    return SearchResult(
        best_noise=finals[best],  # final sample of the winning particle
        best_score=final_scores[best],
        best_images=finals[best] if return_images else None,
        history={"scores": (score_log[0] if score_log else final_scores),
                 "resample_scores": score_log,
                 "final_scores": final_scores,
                 "ess": jnp.stack(ess_log) if ess_log else None,
                 "resampled": (jnp.stack(resampled_log)
                               if resampled_log else None),
                 "resample_steps": steps,
                 # the steered POPULATION [N, B, ...] — SMC's product is
                 # every particle, not just the argmax (population-level
                 # quality/diversity is the steering-vs-hacking metric)
                 **({"finals": finals} if return_population else {})},
        nfes=int(round(nfes)),
    )


def gradient_search(
    key: jax.Array,
    initial_noise: jnp.ndarray,
    sched: DiffusionSchedule,
    eps_fn: EpsFn,
    verifier_fn: VerifierFn,
    n_iterations: int = 20,
    lr: float = 0.01,
    return_images: bool = False,
    solver_steps: int | None = None,
    sharding=None,
    clip_denoised: bool = False,
) -> SearchResult:
    """Adam on the noise tensor against a differentiable verifier (C12b).

    By default the sampler runs with per-step rematerialisation
    (`jax.checkpoint`), so backprop through all T steps costs O(1)
    activations + recompute instead of the reference's O(T) graph
    (`search_algorithm.py:396-421`). With ``solver_steps`` set, the
    gradient flows through the deterministic DPM-Solver++(2M) chain
    instead — ``solver_steps`` evals per iteration rather than T, which is
    both cheaper and better-conditioned (no stochastic renoise inside the
    differentiated graph).

    The whole optimisation is ONE `lax.scan` — like the other algorithms,
    it is a pure jittable program with on-device best tracking and zero
    per-iteration host syncs (the reference `.item()`s the loss every step,
    `search_algorithm.py:408-430`). With a `NamedSharding`, the noise batch
    spreads over the mesh's data axis (gradients reduce over ICI).
    """
    opt = optax.adam(lr)
    if sharding is not None:
        initial_noise = jax.lax.with_sharding_constraint(
            initial_noise, sharding)

    def score_of(noise, k):
        if sharding is not None:
            noise = jax.lax.with_sharding_constraint(noise, sharding)
        if solver_steps is not None:
            from ..core.sampling import dpm_solver_sample
            images = dpm_solver_sample(sched, eps_fn, noise, k,
                                       num_steps=solver_steps)
        else:
            images = sample(sched, eps_fn, noise, k, remat=True,
                            clip_denoised=clip_denoised)
        return verifier_fn(images)

    grad_fn = jax.value_and_grad(lambda n, k: -score_of(n, k))

    def iteration(carry, k):
        noise, opt_state, best_noise, best_score = carry
        loss, g = grad_fn(noise, k)
        score = _nan_to_neg_inf(-loss)
        # the score was evaluated AT `noise` (pre-update), so `noise` is
        # the incumbent for best tracking — same semantics as the old
        # host-side loop, now an on-device select
        improved = score > best_score
        best_noise = jnp.where(improved, noise, best_noise)
        best_score = jnp.maximum(score, best_score)
        updates, opt_state = opt.update(g, opt_state, noise)
        noise = optax.apply_updates(noise, updates)
        return ((noise, opt_state, best_noise, best_score),
                (-loss, optax.global_norm(g)))

    keys = jax.random.split(key, n_iterations)
    init = (initial_noise, opt.init(initial_noise), initial_noise,
            jnp.asarray(-jnp.inf))
    (_, _, best_noise, best_score), (scores, grad_norms) = lax.scan(
        iteration, init, keys)

    result_images = None
    if return_images:
        if solver_steps is not None:
            from ..core.sampling import dpm_solver_sample
            result_images = dpm_solver_sample(
                sched, eps_fn, best_noise, jax.random.fold_in(key, n_iterations),
                num_steps=solver_steps)
        else:
            result_images = sample(sched, eps_fn, best_noise,
                                   jax.random.fold_in(key, n_iterations),
                                   clip_denoised=clip_denoised)
    return SearchResult(
        best_noise=best_noise,
        best_score=best_score,
        best_images=result_images,
        history={"scores": scores,
                 "grad_norms": grad_norms},
        nfes=n_iterations + (1 if return_images else 0),
    )
