"""Does Feynman-Kac particle steering beat independent best-of-N at equal NFE?

`smc_search` (search/algorithms.py) resamples a 16-particle population at
x0-hat checkpoints instead of drawing 16 independent chains, at the SAME
NFE (plus 3 scoring evals, ~0.3% of the budget). lambda_temp=0 never trips
the ESS gate, so the lambda=0 arm IS 16 independent ancestral chains —
its argmax is exactly best-of-16 — which makes this a single-code-path
lambda sweep on the TRAINED committed artifact (shapes32_uncond +
classifier_shapes32), over `--seeds` independent runs:

  - E[best final verifier score] per lambda in {0, 2, 10}
  - E[mean final score] of the population (SMC's real product: EVERY
    particle is steered, not just the argmax — the serve-all-outputs case)
  - the population's independent FID-proxy (64 images/seed): what
    selection pressure costs in distributional quality (verifier-hacking
    surface, paper §verifier hacking)

The claim under test is backend-independent (bit-identical programs on any
backend); only wall_s is hardware-specific. A non-TPU run writes to
smc_budget_<backend>.json so a later on-chip capture lands beside it.

Usage: python experiments/smc_budget.py [--seeds 20]
Writes: docs/results/smc_budget.json (resumable per seed)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS = os.path.join(REPO, "docs", "results")
ARTIFACTS = os.path.join(REPO, "artifacts")
TARGET = 3
LAMBDAS = (0.0, 2.0, 10.0)
RESAMPLE_STEPS = (700, 400, 150)
N_PARTICLES = 16


def note(m):
    print(f"[smc] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lambdas", type=str, default=None,
                    help="comma-separated lambda_temp arms to (incrementally)"
                         " add to the result file, e.g. '0.05,0.2,0.5'; "
                         "default is the original 0,2,10 sweep. Existing "
                         "arms in the file are kept and skipped per-seed.")
    ap.add_argument("--scale", choices=("absolute", "spread"),
                    default="absolute",
                    help="lambda_scale passed to smc_search; 'spread' "
                         "writes to smc_budget_spread.json (same schema) "
                         "so dimensionless-lambda arms sit beside the "
                         "absolute sweep")
    ap.add_argument("--T", type=int, default=None,
                    help="SMOKE ONLY: shorten the chain for a CPU pipeline "
                         "validation (mismatched with the trained schedule "
                         "-> scores are meaningless; never use for a "
                         "reported measurement)")
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import bench as _bench
    import experiments.train_artifacts as ta
    from itsd_tpu.core import linear_schedule
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.search import smc_search, smc_search_nfes
    from itsd_tpu.search.verifiers import classifier_verifier, \
        make_fid_proxy

    params = _bench.load_artifact_params("shapes32_uncond")
    assert params is not None, "artifacts/shapes32_uncond missing"
    model, _ = ta.build_unet("shapes32_uncond")
    sched = linear_schedule(1e-4, 0.02, args.T or ta.TRAIN_T)
    eps_fn = lambda x, t: model.apply(params, x, t)

    logit_fn, _, _ = load_classifier(
        os.path.join(ARTIFACTS, "classifier_shapes32"))
    B = args.batch
    targets = jnp.full((B,), TARGET, jnp.int32)
    verifier = classifier_verifier(logit_fn, targets)
    shape = (B, 32, 32, 3)

    images, _ = shapes_dataset(n=2048, img_size=32, num_labels=10, seed=0)
    fid_proxy = make_fid_proxy(jnp.asarray(images[-512:]))

    rsteps = RESAMPLE_STEPS
    if args.T:  # smoke: scale the checkpoints into the shortened chain
        rsteps = tuple(max(1, t * args.T // ta.TRAIN_T)
                       for t in RESAMPLE_STEPS)
    nfe = smc_search_nfes(sched.T, N_PARTICLES, rsteps)
    note(f"smc NFE = {nfe} full-denoise units (best-of-16 = 16)")

    run_lambdas = (tuple(float(x) for x in args.lambdas.split(","))
                   if args.lambdas else LAMBDAS)

    runners = {}
    for lam in run_lambdas:
        def _run(k, lam=lam):
            r = smc_search(k, sched, eps_fn, verifier, shape,
                           n_particles=N_PARTICLES, resample_steps=rsteps,
                           lambda_temp=lam, ess_threshold=0.5,
                           lambda_scale=args.scale,
                           return_images=False, return_population=True)
            h = r.history
            return (h["final_scores"], h["finals"], h["ess"], h["resampled"])
        runners[lam] = jax.jit(_run)

    backend = jax.default_backend()
    stem = "smc_budget" if args.scale == "absolute" else "smc_budget_spread"
    path = os.path.join(
        RESULTS,
        f"{stem}_smoke.json" if args.T
        else (f"{stem}.json" if backend == "tpu"
              else f"{stem}_{backend}.json"))

    # Per-seed AND per-arm resumable: a relay flap keeps every finished
    # seed, and a later --lambdas run adds arms without re-running old ones.
    rows = {}
    if os.path.isfile(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("seeds_done", 0) and prev.get("backend") == backend:
            rows = prev["per_seed"]
            note(f"resuming from {path} (arms: {sorted(rows)})")
    for lam in run_lambdas:
        rows.setdefault(str(lam), [])

    def seeds_done():
        return min(len(rows[str(lam)]) for lam in run_lambdas)

    def save(complete):
        summary = {
            "workload": ("FK/SMC particle steering vs independent "
                         "best-of-16 at equal NFE; trained shapes32_uncond,"
                         f" classifier verifier (target {TARGET}), T="
                         f"{sched.T} ancestral, {args.seeds} seeds, "
                         f"{N_PARTICLES} particles, resample@{list(rsteps)},"
                         " ess_threshold=0.5"),
            "backend": backend,
            "lambda_scale": args.scale,
            "nfe": {"smc": nfe, "bestof16": N_PARTICLES},
            "complete": complete,
            "seeds_done": seeds_done(),
            "wall_s": round(time.time() - t0, 1),
            "per_seed": rows,
        }
        summary["arms"] = {}
        for key in sorted(rows, key=float):
            rs = rows[key]
            if not rs:
                continue
            lam = key
            summary["arms"][str(lam)] = {
                "E_best": float(np.mean([r["best"] for r in rs])),
                "E_population_mean": float(np.mean([r["mean"] for r in rs])),
                "population_fid_proxy": float(np.mean(
                    [r["fid_proxy"] for r in rs])),
                "resample_rate": float(np.mean(
                    [r["resampled"] for r in rs])),
                "mean_ess": float(np.mean([r["ess"] for r in rs])),
            }
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    t0 = time.time()
    for s in range(args.seeds):
        k = jax.random.PRNGKey(2000 + s)  # same key -> same initial noises
        for lam in run_lambdas:
            if len(rows[str(lam)]) > s:
                continue  # this (seed, arm) already measured
            fs, finals, ess, resampled = runners[lam](k)
            fs = np.asarray(fs, np.float64)
            pop = jnp.reshape(finals, (-1,) + finals.shape[2:])
            rows[str(lam)].append({
                "best": float(np.nanmax(fs)),
                "mean": float(np.nanmean(fs)),
                "fid_proxy": float(fid_proxy(pop)),
                "ess": float(np.mean(np.asarray(ess))),
                "resampled": float(np.mean(np.asarray(resampled))),
            })
        save(complete=False)
        note(f"seed {s}: " + " | ".join(
            f"lam={lam}: best {rows[str(lam)][s]['best']:.3f} "
            f"mean {rows[str(lam)][s]['mean']:.3f}"
            for lam in run_lambdas) + f" ({time.time()-t0:.0f}s)")
    summary = save(complete=True)
    note(json.dumps(summary["arms"], indent=1))
    note(f"-> {path}")


if __name__ == "__main__":
    main()
