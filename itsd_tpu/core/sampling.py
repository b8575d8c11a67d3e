"""Ancestral DDPM sampling as `lax.scan` — the TPU answer to the reference's
Python `for time_step in reversed(range(T))` loop
(`/root/reference/Diffusion/Diffusion.py:84-102`).

Design notes
------------
* One `lax.scan` over the whole trajectory: XLA compiles a single fused step
  and loops on-device — no per-step Python dispatch, no per-step host sync
  (the reference prints and NaN-asserts every step, `Diffusion.py:91,100`).
* Noiselessness at t=0 is a `where` mask, not a branch.
* `denoise_segment` runs a *static* sub-range [t_from, t_to) of the reverse
  chain — the primitive that makes real search-over-paths possible (the
  reference's PathSearch injection is an acknowledged placeholder,
  `search/search_algorithm.py:307-312`).
* `sample_with_snapshots` emits intermediate states every `interval` steps
  for the metric-tracked sampling workflow
  (`/root/reference/Diffusion/Train.py:25-166`) without materialising all T
  states: it scans segment-by-segment and stacks only the snapshots.
* Optional NaN checking is available out-of-band via
  `itsd_tpu.utils.debug.assert_finite` (checkify-based), instead of a per-step
  device sync in the hot loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .process import EpsFn, p_sample_step
from .schedules import DiffusionSchedule


def _scan_steps(sched: DiffusionSchedule, eps_fn: EpsFn, x: jnp.ndarray,
                key: jax.Array, t_hi: int, t_lo: int,
                remat: bool = False, unroll: int = 1,
                clip_x0: bool = False
                ) -> Tuple[jnp.ndarray, jax.Array]:
    """Run reverse steps for t = t_hi-1, ..., t_lo (inclusive). Static bounds."""
    ts = jnp.arange(t_hi - 1, t_lo - 1, -1, dtype=jnp.int32)

    def step(carry, t):
        x, key = carry
        key, nkey = jax.random.split(key)
        tb = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        eps = eps_fn(x, tb)
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        x = p_sample_step(sched, x, tb, eps, noise, clip_x0=clip_x0)
        return (x, key), None

    if remat:
        # Rematerialise each step in the backward pass: this is what makes
        # gradient-based noise search practical (the reference holds the full
        # O(T) activation graph, `search_algorithm.py:396-421`).
        step = jax.checkpoint(step)

    n = t_hi - t_lo
    u = unroll if n % unroll == 0 else 1
    if u != unroll:
        import warnings
        warnings.warn(
            f"sampler unroll={unroll} does not divide segment length {n}; "
            "falling back to unroll=1", stacklevel=2)
    (x, key), _ = lax.scan(step, (x, key), ts, unroll=u)
    return x, key


def sample(sched: DiffusionSchedule, eps_fn: EpsFn, x_T: jnp.ndarray,
           key: jax.Array, *, clip_output: bool = True,
           remat: bool = False, unroll: int = 1,
           clip_denoised: bool = False) -> jnp.ndarray:
    """Full ancestral sampling: x_T ~ N(0, I) -> x_0, clipped to [-1, 1].

    Semantics match `GaussianDiffusionSampler.forward`
    (`Diffusion/Diffusion.py:84-102`). ``unroll`` unrolls the scan body
    (XLA can overlap/fuse across steps at some compile-time cost).
    ``clip_denoised`` clips the per-step x_0-hat (see
    `process.p_sample_step`) — the stabiliser for long extrapolative-CFG
    chains (T=3000, w=1.8) whose state otherwise grows without bound.
    """
    x, _ = _scan_steps(sched, eps_fn, x_T, key, sched.T, 0, remat=remat,
                       unroll=unroll, clip_x0=clip_denoised)
    return jnp.clip(x, -1.0, 1.0) if clip_output else x


def denoise_segment(sched: DiffusionSchedule, eps_fn: EpsFn, x_t: jnp.ndarray,
                    key: jax.Array, t_from: int, t_to: int = 0, *,
                    clip_output: bool = False,
                    clip_denoised: bool = False,
                    return_key: bool = False) -> jnp.ndarray:
    """Denoise from state x_{t_from} down to x_{t_to}.

    ``t_from``/``t_to`` are *static* Python ints (search injection points are
    config constants), so each distinct segment compiles once. ``t_from`` is
    exclusive-high in timestep terms: the first step evaluated is
    t = t_from - 1; with t_to = 0 this finishes the chain.

    ``return_key=True`` also returns the scan's carried PRNG key, so a chain
    of segments chained across separate device launches (to bound per-launch
    device time under TPU-worker watchdogs) is bit-identical to one
    ``sample`` call with the same starting key.
    """
    assert 0 <= t_to < t_from <= sched.T, (t_from, t_to)
    x, k_out = _scan_steps(sched, eps_fn, x_t, key, t_from, t_to,
                           clip_x0=clip_denoised)
    x = jnp.clip(x, -1.0, 1.0) if clip_output else x
    return (x, k_out) if return_key else x


def renoise(sched: DiffusionSchedule, x_t: jnp.ndarray, t_now: int,
            t_target: int, key: jax.Array) -> jnp.ndarray:
    """Push a partially-denoised state x_{t_now} forward to noise level
    t_target > t_now by composing forward-process increments:

        x_{t_target} = sqrt(a_bar_target / a_bar_now) * x_{t_now}
                       + sqrt(1 - a_bar_target / a_bar_now) * eps

    This is q(x_{t_target} | x_{t_now}) marginalised through the Markov chain
    — the "noise injection" step the paper's search-over-paths requires and
    the reference left unimplemented (`search_algorithm.py:307-312`).
    Indices refer to *states*: state i has marginal a_bar[i-1] for i >= 1 and
    is the clean image for i = 0.
    """
    assert 0 <= t_now < t_target <= sched.T, (t_now, t_target)
    ab = sched.alphas_bar
    ab_now = 1.0 if t_now == 0 else ab[t_now - 1]
    ab_tgt = ab[t_target - 1]
    ratio = ab_tgt / ab_now
    eps = jax.random.normal(key, x_t.shape, x_t.dtype)
    return jnp.sqrt(ratio) * x_t + jnp.sqrt(1.0 - ratio) * eps


def _segment_state_grid(t_from: int, t_to: int, num_steps: int,
                        targets) -> "np.ndarray":
    """Strictly decreasing state grid s_0=t_from > ... > s_n=t_to from a
    host-side target sequence (uniform-t or uniform-lambda values snapped
    to ints). Static (t_from, t_to, num_steps) => computed at trace time."""
    import numpy as np

    states = np.asarray(np.round(targets), dtype=np.int64)
    states[0], states[-1] = t_from, t_to
    # Repair only the INTERIOR: endpoints are pinned, and num_steps <=
    # t_from - t_to guarantees the interior fits strictly between them.
    for i in range(1, len(states) - 1):       # forward: strictly decreasing
        states[i] = min(states[i], states[i - 1] - 1)
    for i in range(len(states) - 2, 0, -1):   # backward: repair underflow
        states[i] = max(states[i], states[i + 1] + 1)
    assert states[0] == t_from and states[-1] == t_to
    assert (np.diff(states) < 0).all(), states
    return states


def _host_alphas_bar(sched: DiffusionSchedule, who: str) -> "np.ndarray":
    """The fast samplers build their timestep grids on HOST at trace time,
    so the schedule must be a static closed-over value, not a jit argument
    (the ancestral `sample` is the schedule-polymorphic one — it gathers
    coefficients on device). A clear contract error beats the
    TracerArrayConversionError users would otherwise hit."""
    import numpy as np

    if isinstance(sched.alphas_bar, jax.core.Tracer):
        raise TypeError(
            f"{who}: the schedule must be STATIC (closed over by the "
            "jitted function), not passed as a jit argument — its "
            "timestep grid is computed on host at trace time. Only the "
            "ancestral `sample` supports a traced schedule.")
    return np.asarray(sched.alphas_bar, np.float64)


def ddim_segment(sched: DiffusionSchedule, eps_fn: EpsFn, x_t: jnp.ndarray,
                 key: jax.Array, t_from: int, t_to: int = 0, *,
                 num_steps: int, eta: float = 0.0,
                 clip_output: bool = False,
                 clip_denoised: bool = False) -> jnp.ndarray:
    """DDIM over a strided sub-range of the reverse chain: state x_{t_from}
    -> x_{t_to} in ``num_steps`` model evals (vs t_from - t_to ancestral).

    The segment primitive that composes the fast samplers with
    search-over-paths / pruned search (docs/RESULTS.md Axis 3 shows
    best-of-N over few-step candidates dominates at fixed NFE; this brings
    the same trade to the forking searches, which the reference — ancestral
    Python loops only, `Diffusion/Diffusion.py:84-102` — cannot express).
    State convention as in `renoise`: state i has marginal abar[i-1].

    ``clip_denoised`` clamps the per-step x0-hat to [-1,1] and re-derives
    eps from the clamped estimate (the DDIM form of the reference's
    clipped posterior) — bounds long extrapolative-CFG chains in bf16.
    """
    import numpy as np

    assert 0 <= t_to < t_from <= sched.T, (t_from, t_to)
    num_steps = max(1, min(num_steps, t_from - t_to))
    states = _segment_state_grid(
        t_from, t_to, num_steps,
        np.linspace(t_from, t_to, num_steps + 1))
    ab = _host_alphas_bar(sched, "ddim_segment")

    def abar(s):
        return 1.0 if s == 0 else ab[s - 1]

    ab_cur = np.array([abar(s) for s in states[:-1]])
    ab_nxt = np.array([abar(s) for s in states[1:]])
    sigma = (eta * np.sqrt((1.0 - ab_nxt) / (1.0 - ab_cur))
             * np.sqrt(np.clip(1.0 - ab_cur / ab_nxt, 0.0, None)))
    dir_coeff = np.sqrt(np.clip(1.0 - ab_nxt - sigma ** 2, 0.0, None))
    xs = tuple(jnp.asarray(v, jnp.float32) for v in (
        states[:-1] - 1,                       # eps-eval timestep
        np.sqrt(ab_cur), np.sqrt(1.0 - ab_cur),
        np.sqrt(ab_nxt), dir_coeff, sigma))
    xs = (xs[0].astype(jnp.int32),) + xs[1:]

    def step(carry, per_step):
        x, key = carry
        t_i, sa_c, ss_c, sa_n, dc, sg = per_step
        key, nkey = jax.random.split(key)
        tb = jnp.full((x.shape[0],), t_i, dtype=jnp.int32)
        eps = eps_fn(x, tb)
        x0 = (x - ss_c * eps) / sa_c
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
            eps = (x - sa_c * x0) / jnp.maximum(ss_c, 1e-12)
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        x = sa_n * x0 + dc * eps + sg * noise
        return (x, key), None

    (x, _), _ = lax.scan(step, (x_t, key), xs)
    return jnp.clip(x, -1.0, 1.0) if clip_output else x


def dpm_segment(sched: DiffusionSchedule, eps_fn: EpsFn, x_t: jnp.ndarray,
                key: jax.Array, t_from: int, t_to: int = 0, *,
                num_steps: int, clip_output: bool = False,
                clip_denoised: bool = False) -> jnp.ndarray:
    """DPM-Solver++(2M) over a sub-range: state x_{t_from} -> x_{t_to} in
    ``num_steps`` evals on a uniform-log-SNR grid restricted to the
    segment. Deterministic (``key`` unused; kept for signature uniformity
    with the segment denoisers). See `ddim_segment` for why segments."""
    import numpy as np

    assert 0 <= t_to < t_from <= sched.T, (t_from, t_to)
    num_steps = max(1, min(num_steps, t_from - t_to))
    ab = _host_alphas_bar(sched, "dpm_segment")
    lam_all = 0.5 * (np.log(ab) - np.log1p(-ab))

    # uniform-lambda targets over the segment's REGULAR states (state 0 is
    # lambda=+inf; when t_to==0 the final transition is the exact x0 step)
    lo_state = max(t_to, 1)
    n_reg = num_steps if t_to >= 1 else num_steps - 1
    if n_reg >= 1:
        lam_grid = np.linspace(lam_all[t_from - 1], lam_all[lo_state - 1],
                               n_reg + 1)
        tgt = [int(np.abs(lam_all - l).argmin()) + 1 for l in lam_grid]
        reg = _segment_state_grid(t_from, lo_state, n_reg, tgt)
    else:
        reg = np.asarray([t_from], np.int64)
    states = np.concatenate([reg, [0]]) if t_to == 0 else reg
    ns = len(states) - 1                      # == num_steps

    sig_c = np.sqrt(1.0 - ab[states[:-1] - 1])
    alph_c = np.sqrt(ab[states[:-1] - 1])
    lam_c = np.log(alph_c / sig_c)                 # per evaluated state
    # lam of each TARGET state (inf at the clean target)
    lam_n = np.array([np.inf if k == 0 else lam_all[k - 1]
                      for k in states[1:]])
    sr = np.zeros(ns)
    an = np.ones(ns)
    ph = np.full(ns, -1.0)
    c1 = np.zeros(ns)
    for j in range(ns):
        k = states[j + 1]
        if k > 0:
            sr[j] = np.sqrt(1.0 - ab[k - 1]) / sig_c[j]
            an[j] = np.sqrt(ab[k - 1])
            ph[j] = np.expm1(-(lam_n[j] - lam_c[j]))
        # else: clean target keeps (sr=0, an=1, ph=-1) => x lands on d
        if 0 < j < ns - 1 and np.isfinite(lam_n[j]):
            h_cur = lam_n[j] - lam_c[j]
            h_prev = lam_c[j] - lam_c[j - 1]
            if h_prev > 0:
                c1[j] = 0.5 * h_cur / h_prev       # 2M multistep weight

    xs = (jnp.asarray(states[:-1] - 1, jnp.int32),) + tuple(
        jnp.asarray(v, jnp.float32)
        for v in (sig_c, alph_c, sr, an, ph, c1))

    def step(carry, per_step):
        x, x0_prev = carry
        t_i, sg, al, r, a, p, c = per_step
        tb = jnp.full((x.shape[0],), t_i, dtype=jnp.int32)
        eps = eps_fn(x, tb)
        x0 = (x - sg * eps) / al
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        d = x0 + c * (x0 - x0_prev)
        x = r * x - a * p * d
        return (x, x0), None

    (x, _), _ = lax.scan(step, (x_t, jnp.zeros_like(x_t)), xs)
    return jnp.clip(x, -1.0, 1.0) if clip_output else x


def segment_cost(T: int, sampler: str = "ddpm", num_steps: int = 50):
    """Per-segment model-eval count for a sampler family: ancestral pays
    one eval per step; the fast samplers get a proportional share of the
    full-chain ``num_steps`` budget (diffusion.ddim_steps semantics).
    The static half of `make_segment_denoiser` — usable for NFE
    accounting without building the denoiser."""
    if sampler == "ddpm":
        return lambda hi, lo: hi - lo
    return lambda hi, lo: max(1, min(round(num_steps * (hi - lo) / T),
                                     hi - lo))


def make_segment_denoiser(sched: DiffusionSchedule, eps_fn: EpsFn,
                          sampler: str = "ddpm", num_steps: int = 50,
                          clip_denoised: bool = False, eta: float = 0.0):
    """(denoise_seg, cost) pair for the forking searches.

    ``denoise_seg(x, key, t_from, t_to, clip_output=False)`` runs the
    chosen sampler over the segment; ``cost(t_from, t_to)`` returns its
    model-eval count (static — callers account NFE with it). ``num_steps``
    is the FULL-chain budget; a segment gets a proportional share, so NFE
    accounting stays comparable with `diffusion.ddim_steps` semantics.
    ``eta`` applies to DDIM segments (stochastic when > 0; ignored by the
    deterministic DPM segments and the ancestral path, which is always
    stochastic).
    """
    cost = segment_cost(sched.T, sampler, num_steps)
    if sampler == "ddpm":
        fn = lambda x, k, hi, lo, clip_output=False: denoise_segment(
            sched, eps_fn, x, k, hi, lo, clip_output=clip_output,
            clip_denoised=clip_denoised)
        return fn, cost

    if sampler == "ddim":
        def fn(x, k, hi, lo, clip_output=False):
            return ddim_segment(sched, eps_fn, x, k, hi, lo,
                                num_steps=cost(hi, lo), eta=eta,
                                clip_output=clip_output,
                                clip_denoised=clip_denoised)
    else:
        assert sampler == "dpm", sampler

        def fn(x, k, hi, lo, clip_output=False):
            return dpm_segment(sched, eps_fn, x, k, hi, lo,
                               num_steps=cost(hi, lo),
                               clip_output=clip_output,
                               clip_denoised=clip_denoised)

    return fn, cost


def _validate_restarts(T: int, restarts) -> tuple:
    """Normalise/validate a restart spec: ((t_max, t_min, k), ...) with
    T >= t_max > t_min >= 0 and k >= 1, sorted descending and
    non-overlapping (intervals may touch: next t_max == previous t_min)."""
    spec = tuple((int(a), int(b), int(c)) for a, b, c in restarts)
    prev_lo = T
    for t_max, t_min, k in spec:
        if not (0 <= t_min < t_max <= T):
            raise ValueError(
                f"restart interval ({t_max}, {t_min}) out of range for "
                f"T={T}: need T >= t_max > t_min >= 0")
        if t_max > prev_lo:
            raise ValueError(
                "restart intervals must be sorted descending and "
                f"non-overlapping; ({t_max}, {t_min}) overlaps the "
                f"previous interval (ends at {prev_lo})")
        if k < 1:
            raise ValueError(f"restart count k={k} must be >= 1")
        prev_lo = t_min
    return spec


def restart_sample(sched: DiffusionSchedule, eps_fn: EpsFn,
                   x_T: jnp.ndarray, key: jax.Array, *,
                   restarts, sampler: str = "ddpm", num_steps: int = 50,
                   clip_output: bool = True, clip_denoised: bool = False,
                   eta: float = 0.0) -> jnp.ndarray:
    """Restart sampling (Xu et al. 2023, arXiv:2306.14878): a THIRD
    inference-time scaling axis beyond denoising steps and search. Within
    each configured interval, the chain is re-noised back up via the
    forward process (`renoise`) and re-denoised ``k`` extra times; the
    large forward-noise jump contracts accumulated sampler error faster
    than the extra stochasticity expands it, so quality scales with NFE
    even when plain step-count scaling has saturated (the paper's
    observed plateau) — and unlike best-of-N it needs no verifier.

    The reference has no such capability (its samplers are fixed
    ancestral loops, `/root/reference/Diffusion/Diffusion.py:84-102`).
    Composes with every base sampler family here: segments ride
    ancestral DDPM, DDIM (``eta``), or DPM-Solver++ via
    `make_segment_denoiser`, with NFE accounted by `restart_nfes`. As a
    candidate generator it drops into the search algorithms anywhere a
    ``denoise(noise, key)`` closure is accepted.

    ``restarts``: static ((t_max, t_min, k), ...), sorted descending,
    non-overlapping; each interval is traversed k+1 times total.
    """
    spec = _validate_restarts(sched.T, restarts)
    seg, _ = make_segment_denoiser(sched, eps_fn, sampler,
                                   num_steps=num_steps,
                                   clip_denoised=clip_denoised, eta=eta)
    x, cur, fold = x_T, sched.T, 0

    def nk():
        nonlocal fold
        fold += 1
        return jax.random.fold_in(key, fold)

    for t_max, t_min, k in spec:
        if cur > t_max:
            x = seg(x, nk(), cur, t_max)
        x = seg(x, nk(), t_max, t_min)
        for _ in range(k):
            x = renoise(sched, x, t_min, t_max, nk())
            x = seg(x, nk(), t_max, t_min)
        cur = t_min
    if cur > 0:
        x = seg(x, nk(), cur, 0)
    return jnp.clip(x, -1.0, 1.0) if clip_output else x


def restart_nfes(T: int, restarts, seg_cost=None) -> int:
    """Static model-eval count for `restart_sample`: the base chain plus
    k extra traversals of each restart interval. Pass the ``cost`` half
    of `make_segment_denoiser` for DDIM/DPM runs (the ancestral default
    counts one eval per step, which overstates fast-segment NFE —
    same caveat as `path_search_nfes`)."""
    if seg_cost is None:
        seg_cost = lambda hi, lo: hi - lo
    spec = _validate_restarts(T, restarts)
    total, cur = 0, T
    for t_max, t_min, k in spec:
        if cur > t_max:
            total += seg_cost(cur, t_max)
        total += (k + 1) * seg_cost(t_max, t_min)
        cur = t_min
    if cur > 0:
        total += seg_cost(cur, 0)
    return int(total)


def ddim_sample(sched: DiffusionSchedule, eps_fn: EpsFn, x_T: jnp.ndarray,
                key: jax.Array, *, num_steps: int = 50, eta: float = 0.0,
                clip_output: bool = True) -> jnp.ndarray:
    """DDIM sampling (Song et al. 2021) over a strided subset of the
    training schedule — beyond the reference's capability surface: the
    paper's "scaling denoising steps" axis also runs *downward* (fewer NFE
    at near-equal quality), which ancestral DDPM cannot do.

    ``eta=0`` is deterministic DDIM; ``eta=1`` matches DDPM-like noise
    levels on the sub-schedule. Uses the same eps-prediction model and
    alphas_bar as the ancestral sampler — any checkpoint works unchanged.
    """
    T = sched.T
    assert 1 <= num_steps <= T
    # strided timestep subset, always ending at 0 (state convention as in
    # `renoise`: a state with b steps remaining has marginal abar[b-1])
    ts = jnp.linspace(T - 1, 0, num_steps).round().astype(jnp.int32)
    ab = sched.alphas_bar

    def step(carry, idx):
        x, key = carry
        key, nkey = jax.random.split(key)
        t_cur = ts[idx]
        # abar of the *next* state (1.0 once we step to the clean image)
        t_next_idx = jnp.minimum(idx + 1, num_steps - 1)
        is_last = idx == num_steps - 1
        ab_cur = ab[t_cur]
        ab_next = jnp.where(is_last, 1.0, ab[ts[t_next_idx]])

        tb = jnp.full((x.shape[0],), t_cur, dtype=jnp.int32)
        eps = eps_fn(x, tb)
        x0 = (x - jnp.sqrt(1.0 - ab_cur) * eps) / jnp.sqrt(ab_cur)
        sigma = (eta * jnp.sqrt((1.0 - ab_next) / (1.0 - ab_cur))
                 * jnp.sqrt(1.0 - ab_cur / ab_next))
        sigma = jnp.where(is_last, 0.0, sigma)
        dir_coeff = jnp.sqrt(jnp.clip(1.0 - ab_next - sigma ** 2, 0.0, None))
        noise = jax.random.normal(nkey, x.shape, x.dtype)
        x = (jnp.sqrt(ab_next) * x0 + dir_coeff * eps + sigma * noise)
        return (x, key), None

    (x, _), _ = lax.scan(step, (x_T, key),
                         jnp.arange(num_steps, dtype=jnp.int32))
    return jnp.clip(x, -1.0, 1.0) if clip_output else x


def dpm_solver_sample(sched: DiffusionSchedule, eps_fn: EpsFn,
                      x_T: jnp.ndarray, key: jax.Array, *,
                      num_steps: int = 20,
                      clip_output: bool = True,
                      clip_denoised: bool = False) -> jnp.ndarray:
    """DPM-Solver++(2M) (Lu et al. 2022): deterministic second-order
    *multistep* probability-flow sampling — beyond the reference's surface
    (its only samplers are ancestral DDPM loops,
    `/root/reference/Diffusion/Diffusion.py:84-102`). Each step reuses the
    previous model output, so the cost per step is exactly one eps eval
    (same NFE accounting as DDIM) but the local error is O(h^3) instead of
    O(h^2): ~10-20 steps match DDIM-50 quality, which multiplies best-of-N
    search throughput at fixed NFE budget.

    Works off the same eps-prediction model and ``alphas_bar`` as the other
    samplers — any checkpoint works unchanged. All per-step coefficients
    (log-SNR gaps, sigma ratios, multistep weights) are precomputed on host
    in float64 at trace time; the scanned body is one model eval plus a
    few fused AXPYs. The last step is first-order with a zero terminal
    sigma (the standard "lower-order final" rule), which lands exactly on
    the x0 prediction. ``key`` is accepted for signature uniformity with
    the stochastic samplers but unused (the solver is deterministic).
    """
    # Delegates to dpm_segment over the full chain (t_from=T, t_to=0):
    # verified bit-identical across (T, num_steps) grid points, so the
    # intricate log-SNR grid / 2M-weight math lives in ONE place.
    T = sched.T
    assert 2 <= num_steps <= T
    return dpm_segment(sched, eps_fn, x_T, key, T, 0,
                       num_steps=num_steps, clip_output=clip_output,
                       clip_denoised=clip_denoised)


def parallel_picard_sample(sched: DiffusionSchedule, eps_fn: EpsFn,
                           x_T: jnp.ndarray, key: jax.Array, *,
                           num_steps: int = 50,
                           max_iters: int | None = None,
                           tol: float = 1e-3,
                           clip_output: bool = True,
                           sharding=None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parallel-in-time sampling by Picard iteration (ParaDiGMS, Shih et
    al. 2023, arXiv 2305.16317) over the deterministic DDIM grid — a
    TPU-first trade: spend spare MXU batch capacity to cut *sequential*
    denoising latency.

    The sequential recurrence ``x_{j+1} = c_j x_j + d_j eps(x_j, t_j)`` is
    rewritten in integral form ``x_j = x_T + sum_{i<j} g_i(x_i)`` and
    iterated jointly: every Picard sweep evaluates the model at ALL grid
    points in ONE batched call (the time grid folds into the batch axis,
    exactly like search candidates), then a cumulative sum refreshes the
    whole trajectory. After k sweeps the first k points are exact, so
    ``max_iters = num_steps`` reproduces sequential DDIM bit-for-bit (mod
    float reassociation); in practice the iteration converges in far fewer
    sweeps, and wall-clock wins whenever the chip is latency-bound rather
    than FLOPs-bound at batch B. The folded ``num_steps*B`` axis is also
    the natural mesh-sharding axis — multi-chip parallel-in-time.

    Returns ``(x_0, n_sweeps_used)``. ``key`` is unused (deterministic
    eta=0 grid), kept for signature uniformity.
    """
    import numpy as np

    T = sched.T
    n = num_steps
    assert 2 <= n <= T
    if max_iters is None:
        max_iters = n
    ab = _host_alphas_bar(sched, "parallel_picard_sample")
    ts = np.linspace(T - 1, 0, n).round().astype(np.int32)
    a = np.concatenate([np.sqrt(ab[ts]), [1.0]])        # states 0..n
    s = np.concatenate([np.sqrt(1.0 - ab[ts]), [0.0]])
    c = a[1:] / a[:-1]                                  # [n]
    d = s[1:] - a[1:] * s[:-1] / a[:-1]

    B = x_T.shape[0]
    t_fold = jnp.repeat(jnp.asarray(ts, jnp.int32), B)  # [n*B]
    # broadcast over [n, B, *data-dims] — shape-polymorphic like the rest
    # of core (latent-vector x_T works, not only NHWC images)
    bshape = (n,) + (1,) * x_T.ndim
    cm1 = jnp.asarray(c - 1.0, jnp.float32).reshape(bshape)
    dd = jnp.asarray(d, jnp.float32).reshape(bshape)

    def sweep(X):
        Xf = X.reshape((n * B,) + x_T.shape[1:])
        if sharding is not None:
            # shard the folded time-grid axis over the mesh: each sweep's
            # model eval splits across chips, dividing sequential latency
            # by the device count (the same axis-folding trick as search
            # candidates)
            Xf = jax.lax.with_sharding_constraint(Xf, sharding)
        eps = eps_fn(Xf, t_fold)
        eps = eps.reshape(X.shape)
        g = cm1 * X + dd * eps                          # [n, B, ...]
        cums = jnp.cumsum(g, axis=0)
        # X[0] stays x_T; X[j] = x_T + sum_{i<j} g_i ; final = x_T + sum g
        X_new = jnp.concatenate(
            [X[:1], x_T[None] + cums[:-1]], axis=0)
        final = x_T + cums[-1]
        return X_new, final

    X0 = jnp.broadcast_to(x_T[None], (n,) + x_T.shape)

    def cond(carry):
        _, _, delta, it = carry
        return jnp.logical_and(it < max_iters, delta > tol)

    def body(carry):
        X, _, _, it = carry
        X_new, final = sweep(X)
        delta = jnp.abs(X_new - X).mean(axis=tuple(range(1, X.ndim))).max()
        return X_new, final, delta, it + 1

    _, final, _, iters = lax.while_loop(
        cond, body, (X0, x_T, jnp.asarray(jnp.inf, jnp.float32),
                     jnp.asarray(0, jnp.int32)))
    out = jnp.clip(final, -1.0, 1.0) if clip_output else final
    return out, iters


def sample_with_snapshots(
    sched: DiffusionSchedule, eps_fn: EpsFn, x_T: jnp.ndarray, key: jax.Array,
    interval: int, *, clip_output: bool = True, clip_denoised: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ancestral sampling that also returns intermediate states.

    Returns ``(x_0, snapshot_ts, snapshots)`` where ``snapshots[i]`` is the
    state after denoising down to timestep ``snapshot_ts[i]`` — the on-device
    equivalent of the reference's metric-tracked sampling loop
    (`Diffusion/Train.py:25-166`), which recomputed metrics mid-loop on host.
    Here the caller scores the stacked snapshots afterwards (vmappable).

    ``clip_denoised`` applies the per-step x0-hat clamp exactly as in
    `sample` — required for the reference's own extended-T inference
    operating point (`/root/reference/config/inference_config.yaml:18-32`,
    T=3000 w=1.8), where an unclamped bf16 CFG chain overflows.

    Memory: only T/interval states are kept, not T.
    """
    T = sched.T
    assert 1 <= interval <= T
    # Segment boundaries: T -> b1 -> b2 -> ... -> 0, anchored at T, each
    # segment `interval` steps except possibly the LAST (nearest t=0),
    # which carries the remainder — e.g. T=10, interval=4 snapshots at
    # t = 6, 2, 0.
    bounds = list(range(T, -1, -interval))
    if bounds[-1] != 0:
        bounds.append(0)

    x = x_T
    snaps = []
    snap_ts = []
    for hi, lo in zip(bounds[:-1], bounds[1:]):
        x, key = _scan_steps(sched, eps_fn, x, key, hi, lo,
                             clip_x0=clip_denoised)
        snaps.append(x)
        snap_ts.append(lo)
    x0 = jnp.clip(x, -1.0, 1.0) if clip_output else x
    return x0, jnp.asarray(snap_ts, dtype=jnp.int32), jnp.stack(snaps)
