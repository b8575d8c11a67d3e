"""Does successive-halving over noise beat best-of-N at equal NFE?

The paper's search axis spends `N * T` evals on best-of-N; `pruned_search`
(search/algorithms.py) starts wide and narrows at x0-hat checkpoints, so a
16-start pruned run costs roughly half a best-of-16. This measures, on the
TRAINED committed artifact (shapes32_uncond + classifier_shapes32), over
`--seeds` independent runs:

  - E[best verifier score] for pruned 16 -> 8@700 -> 4@400 -> 2@150
  - E[best] for random best-of-N at the SAME NFE (interpolated N)
  - E[best] for full best-of-16 (2x the NFE)
plus the independent FID-proxy of each winner (verifier-hacking check).

The claim under test (quality at equal NFE) is backend-independent —
the chains are bit-identical programs on any backend — so a CPU run is
a valid measurement of E[best]; only wall_s is hardware-specific. A
non-TPU run therefore writes to pruned_budget_<backend>.json (with the
backend recorded inside) so a later on-chip capture can land beside it
rather than on top of it.

Usage: python experiments/pruned_budget.py [--seeds 20]
Writes: docs/results/pruned_budget.json (resumable per seed)
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


def note(m):
    print(f"[pruned] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--T", type=int, default=None,
                    help="SMOKE ONLY: override chain length for a CPU "
                         "pipeline validation (mismatched with the "
                         "trained schedule -> scores are meaningless; "
                         "never use for a reported measurement)")
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import bench as _bench
    import experiments.train_artifacts as ta
    from itsd_tpu.core import linear_schedule, sample
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.search import pruned_search, random_search
    from itsd_tpu.search.algorithms import pruned_search_nfes
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

    PSCHED = ((700, 8), (400, 4), (150, 2))
    if args.T:  # smoke: scale the prune points into the shortened chain
        PSCHED = tuple((max(1, t * args.T // ta.TRAIN_T), k)
                       for t, k in PSCHED)
    N_START = 16
    nfe_pruned = pruned_search_nfes(sched.T, N_START, PSCHED)
    note(f"pruned NFE = {nfe_pruned} full-denoise units (best-of-16 = 16)")

    denoise = lambda noise, k: sample(sched, eps_fn, noise, k)

    run_pruned = jax.jit(lambda k: pruned_search(
        k, sched, eps_fn, verifier, shape, n_candidates=N_START,
        prune_schedule=PSCHED).best_images)
    @jax.jit
    def run_pool(k):
        r = random_search(k, shape, denoise, verifier,
                          n_candidates=N_START, return_images=True)
        return r.history["scores"], r.best_images

    def pool_results(k):
        sc, bi = run_pool(k)
        return np.asarray(sc), np.asarray(bi)

    backend = jax.default_backend()
    path = os.path.join(
        RESULTS,
        "pruned_budget_smoke.json" if args.T
        else ("pruned_budget.json" if backend == "tpu"
              else f"pruned_budget_{backend}.json"))

    # Per-seed resumable: a relay flap (or a long CPU run interrupted)
    # keeps every finished seed, including the 16-score pools the
    # bootstrap needs.
    rows = {"pruned": [], "bestof16": []}
    pool_scores_all = []
    if os.path.isfile(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("seeds_done", 0) and prev.get("backend") == backend:
            rows = prev["per_seed"]
            pool_scores_all = [np.asarray(p, np.float64)
                               for p in prev["pool_scores"]]
            note(f"resuming at seed {len(pool_scores_all)} from {path}")

    def save(complete):
        summary = {
            "workload": ("pruned successive-halving vs best-of-N at equal "
                         "NFE; trained shapes32_uncond, classifier "
                         f"verifier (target {TARGET}), T=1000 ancestral, "
                         f"{args.seeds} seeds"),
            "backend": backend,
            "prune_schedule": [list(p) for p in PSCHED],
            "nfe": {"pruned": nfe_pruned, "bestof16": N_START},
            "complete": complete,
            "seeds_done": len(pool_scores_all),
            "wall_s": round(time.time() - t0, 1),
            "per_seed": rows,
            "pool_scores": [np.asarray(p).tolist()
                            for p in pool_scores_all],
        }
        if pool_scores_all:
            pools = np.stack(pool_scores_all)  # [seeds_done, 16]
            rng = np.random.default_rng(0)

            def ebest_at(n):
                # E[max of n] by bootstrap over the measured pools
                idx = rng.integers(0, pools.shape[1],
                                   size=(400, pools.shape[0], n))
                return float(np.nanmax(
                    np.take_along_axis(pools[None].repeat(400, 0), idx,
                                       axis=2),
                    axis=2).mean())

            summary["E_best"] = {
                "pruned_16start": float(np.mean(
                    [r["score"] for r in rows["pruned"]])),
                "bestof16_full": float(np.mean(
                    [r["score"] for r in rows["bestof16"]])),
                f"random_bestof{nfe_pruned}_equal_nfe":
                    ebest_at(int(round(nfe_pruned))),
                "random_bestof8": ebest_at(8),
            }
            summary["fid_proxy_mean"] = {
                "pruned": float(np.mean(
                    [r["fid_proxy"] for r in rows["pruned"]])),
                "bestof16": float(np.mean(
                    [r["fid_proxy"] for r in rows["bestof16"]])),
            }
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    t0 = time.time()
    for s in range(len(pool_scores_all), args.seeds):
        k = jax.random.PRNGKey(1000 + s)
        imgs_p = run_pruned(k)
        sp = float(verifier(imgs_p))
        rows["pruned"].append({"score": sp, "fid_proxy": fid_proxy(imgs_p)})
        scores, imgs_b = pool_results(jax.random.fold_in(k, 1))
        pool_scores_all.append(scores)
        rows["bestof16"].append({"score": float(np.nanmax(scores)),
                                 "fid_proxy": fid_proxy(imgs_b)})
        save(complete=False)
        note(f"seed {s}: pruned {sp:.4f} vs best-of-16 "
             f"{rows['bestof16'][-1]['score']:.4f} "
             f"({time.time()-t0:.0f}s)")
    summary = save(complete=True)
    note(json.dumps(summary["E_best"]))
    note(f"-> {path}")


if __name__ == "__main__":
    main()
