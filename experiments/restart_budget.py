"""Restart sampling at FULL scale on the trained committed artifact:
does quality keep scaling with NFE, verifier-free, on chip?

The reduced-scale answer lives in restart_pilot.py / restart_pilot.json;
this is the authoritative on-chip version (queued in tpu_window.py):
shapes32_uncond at its native T=1000, population FID-proxy (pooled-pixel
Frechet vs held-out reals, independent of any verifier) plus mean
classifier confidence, across restart budgets:

  - plain ancestral T=1000                     (NFE 1000/img)
  - restart (700,200,1): one bounce            (NFE 1500/img)
  - restart (700,200,3): three bounces         (NFE 2500/img)
  - restart (850,100,2): wider, two bounces    (NFE 2500/img)

No verifier selects anything, so any FID-proxy improvement cannot be
verifier hacking — the claim under test is the paper-adjacent axis that
`diffusion.restart_intervals` ships (Xu et al. 2023).

Usage: python experiments/restart_budget.py [--seeds 10]
Writes: docs/results/restart_budget.json (resumable per cell;
        backend-suffixed when not run on TPU)
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

ARMS = {
    "plain": (),
    "restart_700_200_x1": ((700, 200, 1),),
    "restart_700_200_x3": ((700, 200, 3),),
    "restart_850_100_x2": ((850, 100, 2),),
}


def note(m):
    print(f"[restart-full] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import bench as _bench
    import experiments.train_artifacts as ta
    from itsd_tpu.core import (linear_schedule, restart_nfes,
                               restart_sample, sample)
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.search.verifiers import make_fid_proxy

    params = _bench.load_artifact_params("shapes32_uncond")
    assert params is not None, "artifacts/shapes32_uncond missing"
    model, _ = ta.build_unet("shapes32_uncond")
    sched = linear_schedule(1e-4, 0.02, ta.TRAIN_T)
    eps_fn = lambda x, t: model.apply(params, x, t)

    logit_fn, _, _ = load_classifier(
        os.path.join(ARTIFACTS, "classifier_shapes32"))
    images, _ = shapes_dataset(n=2048, img_size=32, num_labels=10, seed=0)
    fid_proxy = make_fid_proxy(jnp.asarray(images[-512:]))

    backend = jax.default_backend()
    path = os.path.join(
        RESULTS, "restart_budget.json" if backend == "tpu"
        else f"restart_budget_{backend}.json")

    # One jitted program per arm; the relay watchdog tolerates single
    # T=1000 chains (bench runs them), and the longest arm is ~2.5 chains
    # — chunk restart chains per-segment if that ever regresses.
    progs = {
        name: jax.jit(lambda n, k, r=r: (
            sample(sched, eps_fn, n, k) if not r
            else restart_sample(sched, eps_fn, n, k, restarts=r)))
        for name, r in ARMS.items()
    }

    def confidence(imgs):
        unit = (jnp.asarray(imgs) + 1.0) / 2.0
        p = jax.nn.softmax(logit_fn(unit), axis=-1)
        return float(p.max(axis=-1).mean())

    cells = []
    if os.path.isfile(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("backend") == backend:
            cells = prev.get("cells", [])
    done = {(c["arm"], c["seed"]) for c in cells}

    t0 = time.time()
    shape = (args.batch, 32, 32, 3)
    for seed in range(args.seeds):
        for name, r in ARMS.items():
            if (name, seed) in done:
                continue
            k = jax.random.PRNGKey(4000 + seed)
            noise = jax.random.normal(jax.random.fold_in(k, 0), shape)
            ts = time.time()
            imgs = np.asarray(progs[name](noise,
                                          jax.random.fold_in(k, 1)))
            cells.append({
                "arm": name, "seed": seed,
                "nfe_per_image": restart_nfes(ta.TRAIN_T, r),
                "fid_proxy": float(fid_proxy(imgs)),
                "confidence": confidence(imgs),
                "wall_s": round(time.time() - ts, 1),
            })
            _save(path, cells, backend, args)
            note(f"{name} seed {seed}: proxy "
                 f"{cells[-1]['fid_proxy']:.3f} conf "
                 f"{cells[-1]['confidence']:.3f} ({time.time()-t0:.0f}s)")
    _save(path, cells, backend, args)
    note(f"-> {path}")


def _save(path, cells, backend, args):
    by_arm = {}
    for c in cells:
        by_arm.setdefault(c["arm"], []).append(c)
    summary = {
        name: {
            "nfe_per_image": rows[0]["nfe_per_image"],
            "fid_proxy_mean": float(np.mean([r["fid_proxy"]
                                             for r in rows])),
            "fid_proxy_std": float(np.std([r["fid_proxy"]
                                           for r in rows])),
            "confidence_mean": float(np.mean([r["confidence"]
                                              for r in rows])),
            "n_seeds": len(rows),
        }
        for name, rows in by_arm.items()
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({
            "workload": ("restart sampling vs plain ancestral at "
                         "T=1000 on trained shapes32_uncond; population "
                         "FID-proxy + classifier confidence, "
                         f"verifier-free; batch {args.batch}, "
                         f"{args.seeds} seeds"),
            "backend": backend,
            "summary": summary,
            "cells": cells,
        }, f, indent=1)


if __name__ == "__main__":
    main()
