"""Does restart sampling buy quality for its extra NFE? (reduced-scale
pilot on the self-consistent pilot16 artifact — see
pruned_budget_pilot.py for why pilot scale is the honest CPU option.)

Restart sampling (core.sampling.restart_sample) needs no verifier, so
its comparison is POPULATION quality vs the plain chain, not best-of
selection: for each seed we draw one batch and measure the independent
FID-proxy (pooled-pixel Frechet vs held-out reals) plus the mean
classifier confidence (max softmax — a sharpness signal, target-free) of

  - plain ancestral T=64                          (NFE  64/img)
  - restart (48,16,1): one extra bounce           (NFE  96/img)
  - restart (48,16,3): three bounces              (NFE 160/img)
  - restart (56,8,2) wider interval, two bounces  (NFE 160/img)

If the paper's axis claim transfers, FID-proxy should improve
monotonically with restart NFE — with no verifier in the loop, so the
verifier-hacking failure mode cannot explain the gain.

Usage: python experiments/restart_pilot.py [--seeds 10]
Writes: docs/results/restart_pilot.json (resumable per seed)
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


def note(m):
    print(f"[restart] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from experiments.pruned_budget_pilot import (IMG, PILOT_T,
                                                 build_pilot_unet)
    from itsd_tpu.core import (linear_schedule, restart_nfes,
                               restart_sample, sample)
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.search.verifiers import make_fid_proxy
    from itsd_tpu.train.checkpoint import restore_params

    model = build_pilot_unet()
    adir = os.path.join(ARTIFACTS, "pilot16_uncond")
    assert os.path.isdir(adir), \
        "run experiments/pruned_budget_pilot.py first (trains it)"
    tmpl = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                      jnp.zeros((1,), jnp.int32))
    params = restore_params(adir, tmpl)
    sched = linear_schedule(1e-4, 0.02, PILOT_T)
    eps_fn = lambda x, t: model.apply(params, x, t)

    logit_fn, _, _ = load_classifier(
        os.path.join(ARTIFACTS, "classifier_pilot16"))
    images, _ = shapes_dataset(n=2048, img_size=IMG, num_labels=10,
                               seed=0)
    fid_proxy = make_fid_proxy(jnp.asarray(images[-512:]), pool_hw=4)

    ARMS = {
        "plain": (),
        "restart_48_16_x1": ((48, 16, 1),),
        "restart_48_16_x3": ((48, 16, 3),),
        "restart_56_8_x2": ((56, 8, 2),),
    }
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

    path = os.path.join(RESULTS, "restart_pilot.json")
    cells = []
    if os.path.isfile(path):
        with open(path) as f:
            cells = json.load(f).get("cells", [])
    done = {(c["arm"], c["seed"]) for c in cells}

    t0 = time.time()
    shape = (args.batch, IMG, IMG, 3)
    for seed in range(args.seeds):
        for name, r in ARMS.items():
            if (name, seed) in done:
                continue
            k = jax.random.PRNGKey(4000 + seed)
            noise = jax.random.normal(jax.random.fold_in(k, 0), shape)
            imgs = np.asarray(progs[name](noise, jax.random.fold_in(k, 1)))
            cells.append({
                "arm": name, "seed": seed,
                "nfe_per_image": restart_nfes(PILOT_T, r),
                "fid_proxy": float(fid_proxy(imgs)),
                "confidence": confidence(imgs),
            })
            _save(path, cells, ARMS, args)
            note(f"{name} seed {seed}: proxy {cells[-1]['fid_proxy']:.3f} "
                 f"conf {cells[-1]['confidence']:.3f} "
                 f"({time.time()-t0:.0f}s)")
    _save(path, cells, ARMS, args, final=True)
    note(f"-> {path}")


def _save(path, cells, arms, args, final=False):
    import jax
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
            "workload": ("PILOT (reduced scale): restart sampling vs "
                         "plain ancestral, population FID-proxy, "
                         "verifier-free; self-consistent pilot16_uncond "
                         f"(T=64), batch {args.batch}, "
                         f"{args.seeds} seeds"),
            "scale": "pilot",
            "backend": jax.default_backend(),
            "summary": summary,
            "cells": cells,
        }, f, indent=1)


if __name__ == "__main__":
    main()
