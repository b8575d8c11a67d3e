"""Does SMC resample-CHECKPOINT PLACEMENT matter at the lambda knee?
(VERDICT r4 next #8: the [700,400,150] grid was the only placement ever
measured, while restart sampling showed interval placement matters a lot.)

Same rig as smc_budget.py — trained shapes32_uncond + classifier verifier
(target 3), T=1000 ancestral, 16 particles, lambda_temp=0.2 (the measured
knee of docs/results/smc_budget.json: E_best jumps -26 -> -12.9 between
lambda 0.05 and 0.2) — sweeping WHERE the 3 resample checkpoints sit:

  high_t    (850, 650, 450): steer while structure forms
  uniform   (750, 500, 250): evenly spread
  default   (700, 400, 150): the smc_budget.json grid
  low_t     (450, 250, 100): steer near the end
  final     (300, 150,  50): last-moment selection pressure

All arms have exactly 3 checkpoints, so NFE is identical (chain + 3
scoring evals). Reported per arm: E[best], E[population mean] (the
serve-all-outputs metric), independent population FID-proxy, resample
rate, mean ESS.

Usage: python experiments/smc_placement.py [--seeds 10]
Writes: docs/results/smc_placement.json (resumable per (arm, seed);
        backend-suffixed off-TPU)
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
LAMBDA = 0.2
N_PARTICLES = 16
PLACEMENTS = {
    "high_t_850_650_450": (850, 650, 450),
    "uniform_750_500_250": (750, 500, 250),
    "default_700_400_150": (700, 400, 150),
    "low_t_450_250_100": (450, 250, 100),
    "final_300_150_50": (300, 150, 50),
}


def note(m):
    print(f"[smc-place] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--T", type=int, default=None,
                    help="SMOKE ONLY: shortened chain, random weights")
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import bench as _bench
    import experiments.train_artifacts as ta
    from itsd_tpu.core import linear_schedule
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.search import smc_search, smc_search_nfes
    from itsd_tpu.search.verifiers import (classifier_verifier,
                                           make_fid_proxy)

    T = args.T or ta.TRAIN_T
    model, _ = ta.build_unet("shapes32_uncond")
    if args.T:
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 32, 32, 3)),
                            jnp.zeros((2,), jnp.int32))
    else:
        params = _bench.load_artifact_params("shapes32_uncond")
        assert params is not None, "artifacts/shapes32_uncond missing"
    sched = linear_schedule(1e-4, 0.02, T)
    eps_fn = lambda x, t: model.apply(params, x, t)

    logit_fn, _, _ = load_classifier(
        os.path.join(ARTIFACTS, "classifier_shapes32"))
    B = args.batch
    targets = jnp.full((B,), TARGET, jnp.int32)
    verifier = classifier_verifier(logit_fn, targets)
    shape = (B, 32, 32, 3)

    images, _ = shapes_dataset(n=2048, img_size=32, num_labels=10, seed=0)
    fid_proxy = make_fid_proxy(jnp.asarray(images[-512:]))

    def scaled(steps):
        if not args.T:
            return steps
        return tuple(max(1, t * args.T // ta.TRAIN_T) for t in steps)

    runners = {}
    for name, steps in PLACEMENTS.items():
        def _run(k, steps=scaled(steps)):
            r = smc_search(k, sched, eps_fn, verifier, shape,
                           n_particles=N_PARTICLES,
                           resample_steps=steps,
                           lambda_temp=LAMBDA, ess_threshold=0.5,
                           return_images=False, return_population=True)
            h = r.history
            return (h["final_scores"], h["finals"], h["ess"],
                    h["resampled"])
        runners[name] = jax.jit(_run)
    nfe = smc_search_nfes(sched.T, N_PARTICLES,
                          scaled(next(iter(PLACEMENTS.values()))))

    backend = jax.default_backend()
    path = os.path.join(
        RESULTS,
        "smc_placement_smoke.json" if args.T
        else ("smc_placement.json" if backend == "tpu"
              else f"smc_placement_{backend}.json"))

    rows = {name: [] for name in PLACEMENTS}
    if os.path.isfile(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("backend") == backend:
            for kk, v in prev.get("per_seed", {}).items():
                rows.setdefault(kk, []).extend(
                    x for x in v if x not in rows.get(kk, []))
            note(f"resuming from {path}")

    t0 = time.time()

    def save(complete):
        summary = {
            "workload": ("SMC resample-placement sweep at the lambda knee "
                         f"(lambda_temp={LAMBDA}) on trained "
                         f"shapes32_uncond; T={sched.T} ancestral, "
                         f"{N_PARTICLES} particles, classifier verifier "
                         f"(target {TARGET}), {args.seeds} seeds; all arms "
                         "3 checkpoints = identical NFE"),
            "backend": backend,
            "lambda_temp": LAMBDA,
            "nfe": {"smc": nfe, "bestof16": N_PARTICLES},
            "complete": complete,
            "wall_s": round(time.time() - t0, 1),
            "per_seed": rows,
            "arms": {},
        }
        for name, steps in PLACEMENTS.items():
            rs = rows[name]
            if not rs:
                continue
            summary["arms"][name] = {
                "resample_steps": list(scaled(steps)),
                "n_seeds": len(rs),
                "E_best": float(np.mean([r["best"] for r in rs])),
                "E_best_std": float(np.std([r["best"] for r in rs])),
                "E_population_mean": float(np.mean(
                    [r["mean"] for r in rs])),
                "population_fid_proxy": float(np.mean(
                    [r["fid_proxy"] for r in rs])),
                "resample_rate": float(np.mean(
                    [r["resampled"] for r in rs])),
                "mean_ess": float(np.mean([r["ess"] for r in rs])),
            }
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    for s in range(args.seeds):
        k = jax.random.PRNGKey(2000 + s)  # smc_budget's key stream: the
        # lambda=0.2 default-placement arm there is directly comparable
        for name in PLACEMENTS:
            if len(rows[name]) > s:
                continue
            ts = time.time()
            fs, finals, ess, resampled = runners[name](k)
            fs = np.asarray(fs, np.float64)
            pop = jnp.reshape(finals, (-1,) + finals.shape[2:])
            rows[name].append({
                "best": float(np.nanmax(fs)),
                "mean": float(np.nanmean(fs)),
                "fid_proxy": float(fid_proxy(pop)),
                "ess": float(np.mean(np.asarray(ess))),
                "resampled": float(np.mean(np.asarray(resampled))),
                "wall_s": round(time.time() - ts, 1),
            })
            save(complete=False)
            note(f"seed {s} {name}: best {rows[name][-1]['best']:.2f} "
                 f"mean {rows[name][-1]['mean']:.2f} "
                 f"({time.time() - t0:.0f}s)")
    summary = save(complete=True)
    note(json.dumps(summary["arms"], indent=1))
    note(f"-> {path}")


if __name__ == "__main__":
    main()
