"""Does the autoguidance win survive best-of-N selection? (round 5)

Autoguidance (half-trained twin, w=0.5) beats CFG w=1.8 unsearched on
class control at equal NFE (docs/results/autoguidance.json). This
composes it with the paper's central axis: best-of-N random search over
GUIDED candidate chains — CFG candidates vs autoguided candidates, both
2T evals/chain, so equal N = equal NFE. Selection verifier = mean
log-prob of the REQUESTED classes (the conditional-generation analogue
of the Axis-2 classifier verifier); reported for the selected batch:
verifier score, class-control accuracy, pooled FID-proxy.

Arms (per seed): {cfg_w1.8, auto_mid_w0.5} x best-of-{1, 4}.

Usage: python experiments/autoguidance_search.py [--seeds 3]
Writes: docs/results/autoguidance_search.json (resumable per cell)
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
CFG_W = 1.8
AUTO_W = 0.5


def note(m):
    print(f"[autog-search] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--per-class", type=int, default=1)
    ap.add_argument("--T", type=int, default=None,
                    help="SMOKE ONLY: shortened chain, random weights")
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import experiments.train_artifacts as ta
    from itsd_tpu.core import (linear_schedule, make_autoguidance_eps_fn,
                               make_cfg_eps_fn)
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.metrics import frechet_distance, gaussian_stats
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.search.verifiers import adaptive_avg_pool
    from itsd_tpu.train.checkpoint import restore_params

    T = args.T or ta.TRAIN_T
    sched = linear_schedule(1e-4, 0.02, T)
    model, _ = ta.build_unet("shapes64_cond")

    def load(name, seed):
        if args.T:
            return model.init(jax.random.PRNGKey(seed),
                              jnp.zeros((2, 64, 64, 3)),
                              jnp.zeros((2,), jnp.int32),
                              jnp.zeros((2,), jnp.int32))
        p = restore_params(os.path.join(ARTIFACTS, name))
        return jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float32)
            if getattr(a, "dtype", None) == jnp.bfloat16 else jnp.asarray(a),
            p)

    params_s = load("shapes64_cond", 0)
    params_w = load("shapes64_cond_mid", 1)
    logit_fn, _, _ = load_classifier(
        os.path.join(ARTIFACTS, "classifier_shapes64"))

    images, _ = shapes_dataset(n=2048, img_size=64, num_labels=10, seed=0)
    hold = (np.asarray(images[-512:]) + 1.0) / 2.0
    mu_r, sig_r = gaussian_stats(np.asarray(
        adaptive_avg_pool(jnp.asarray(hold), 8).reshape(len(hold), -1)))

    req = np.repeat(np.arange(10), args.per_class)
    lab_plus1 = jnp.asarray(req + 1, jnp.int32)
    B = len(req)
    req_j = jnp.asarray(req, jnp.int32)
    strong_eps = lambda xx, tt, ll: model.apply(params_s, xx, tt, ll)
    weak_eps = lambda xx, tt, ll: model.apply(params_w, xx, tt, ll)

    # Candidate chains run as host-chained SEGMENT launches with the
    # candidate axis folded into the batch: one 40-row x 2T single-launch
    # program CRASHED the TPU worker (watchdog; the flagship-search
    # failure mode) — 1/SEG-chain launches are the proven-safe shape
    # (diffusion.launch_segments in the product path).
    from functools import partial

    from itsd_tpu.core import denoise_segment

    SEG = min(8, T)
    edges = sorted({round(T * i / SEG) for i in range(SEG, -1, -1)},
                   reverse=True)
    seg_bounds = list(zip(edges[:-1], edges[1:]))

    # labels tile automatically across the candidate fold inside the
    # guided eps_fns (core.process._tile_labels)
    seg_runners = {
        f"cfg_w{CFG_W}": partial(
            jax.jit(lambda x, k, a, b, e=make_cfg_eps_fn(
                strong_eps, lab_plus1, CFG_W): denoise_segment(
                    sched, e, x, k, a, b, return_key=True),
                static_argnames=("a", "b"))),
        f"auto_mid_w{AUTO_W}": partial(
            jax.jit(lambda x, k, a, b, e=make_autoguidance_eps_fn(
                strong_eps, weak_eps, lab_plus1, AUTO_W): denoise_segment(
                    sched, e, x, k, a, b, return_key=True),
                static_argnames=("a", "b"))),
    }

    @jax.jit
    def score_candidates(per):
        # per: [N, B, H, W, C] -> mean log-prob of requested class per cand
        unit = (per + 1.0) / 2.0
        def one(imgs):
            logp = jax.nn.log_softmax(logit_fn(imgs), axis=-1)
            return jnp.take_along_axis(logp, req_j[:, None],
                                       axis=-1).mean()
        return jax.vmap(one)(unit)

    def run_arm(gname, n_cand, key):
        knoise, kden = jax.random.split(key)
        x = jax.random.normal(knoise, (n_cand * B, 64, 64, 3))
        k = kden
        for a, b in seg_bounds:
            x, k = seg_runners[gname](x, k, a, b)
        per = jnp.clip(x, -1.0, 1.0).reshape((n_cand, B, 64, 64, 3))
        scores = score_candidates(per)
        best = int(jnp.argmax(scores))
        return float(scores[best]), np.asarray(per[best])

    progs = {}
    for gname in seg_runners:
        for n_cand in (1, 4):
            progs[f"{gname}_bo{n_cand}"] = (
                partial(run_arm, gname, n_cand), 2 * T * n_cand)

    backend = jax.default_backend()
    path = os.path.join(
        RESULTS,
        "autoguidance_search_smoke.json" if args.T
        else ("autoguidance_search.json" if backend == "tpu"
              else f"autoguidance_search_{backend}.json"))
    cells = []
    if os.path.isfile(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("backend") == backend:
            cells = prev.get("cells", [])
    done = {(c["arm"], c["seed"]) for c in cells}

    t0 = time.time()
    for seed in range(args.seeds):
        for arm_i, (arm, (run, nfe)) in enumerate(progs.items()):
            if (arm, seed) in done:
                continue
            ts = time.time()
            best_score, best_imgs = run(
                jax.random.fold_in(jax.random.PRNGKey(9000 + seed), arm_i))
            unit = (np.asarray(best_imgs, np.float32) + 1.0) / 2.0
            pred = np.asarray(jnp.argmax(logit_fn(jnp.asarray(unit)), -1))
            mu_f, sig_f = gaussian_stats(np.asarray(
                adaptive_avg_pool(jnp.asarray(unit), 8).reshape(B, -1)))
            cells.append({
                "arm": arm, "seed": seed, "nfe_per_image": nfe,
                "verifier_best": float(best_score),
                "acc_of_winner": float((pred == req).mean()),
                "fid_proxy_of_winner": float(frechet_distance(
                    mu_r, sig_r, mu_f, sig_f)),
                "wall_s": round(time.time() - ts, 1),
            })
            _save(path, cells, backend, args)
            note(f"{arm} seed {seed}: verifier "
                 f"{cells[-1]['verifier_best']:.3f} acc "
                 f"{cells[-1]['acc_of_winner']:.3f} "
                 f"({time.time() - t0:.0f}s)")
    _save(path, cells, backend, args)
    note(f"-> {path}")


def _save(path, cells, backend, args):
    by = {}
    for c in cells:
        by.setdefault(c["arm"], []).append(c)
    summary = {a: {
        "nfe_per_image": rs[0]["nfe_per_image"],
        "n_seeds": len(rs),
        "verifier_best_mean": float(np.mean(
            [r["verifier_best"] for r in rs])),
        "acc_mean": float(np.mean([r["acc_of_winner"] for r in rs])),
        "acc_std": float(np.std([r["acc_of_winner"] for r in rs])),
        "fid_proxy_mean": float(np.mean(
            [r["fid_proxy_of_winner"] for r in rs])),
    } for a, rs in by.items()}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({
            "workload": ("best-of-N over GUIDED candidate chains: CFG "
                         "w=1.8 vs autoguidance (half-trained twin, "
                         f"w=0.5), equal 2T evals/chain; {args.seeds} "
                         "seeds, 10 samples/batch (1/class), selection = "
                         "mean log-prob of requested classes"),
            "backend": backend,
            "summary": summary,
            "cells": cells,
        }, f, indent=1)


if __name__ == "__main__":
    main()
