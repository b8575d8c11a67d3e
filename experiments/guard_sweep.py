"""The paper's verifier-hacking failure mode as a measured CURVE
(VERDICT r4 item 8): search budget vs (verifier score, independent
FID-proxy) for random / zero-order / path / pruned search, with the
product guard's pooled unsearched baseline (mean +- std over seeded
draws) as the reference band.

Round-2/3 found the catch at one point (path-64's score rises while its
FID-proxy degrades, docs/RESULTS.md "Conclusions" #2); this measures the
whole curve on the TRAINED committed artifact so `search.guard_ratio`
can be tuned against data instead of a single high-variance draw.

All searches run on the same weights (artifacts/shapes32_uncond, T=1000
ancestral), scored by the same trained classifier verifier
(target-class mean log-prob), batch 4 per candidate — the exact
operating point of the product search CLI on this artifact. The
FID-proxy is the guard's own: Frechet distance on pooled-pixel features
vs held-out real shapes (independent of the search objective; reference
verifier.py has no such check, its FID path is a TODO at
/root/reference/search/verifier.py:65).

Usage: python experiments/guard_sweep.py [--seeds 3] [--quick]
Writes: docs/results/guard_sweep.json + guard_sweep.png
        (resumable: finished (algo, budget, seed) cells are skipped)
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

# validated categorical palette (dataviz reference instance, slots 1-4,
# fixed assignment order)
COLORS = {"random": "#2a78d6", "zero_order": "#eb6834",
          "path": "#1baf7a", "pruned": "#eda100"}
MARKERS = {"random": "o", "zero_order": "s", "path": "^", "pruned": "D"}


def note(m):
    print(f"[guard] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--baseline-draws", type=int, default=8)
    ap.add_argument("--quick", action="store_true",
                    help="smallest budgets only (CPU smoke)")
    ap.add_argument("--plot-only", action="store_true")
    ap.add_argument("--T", type=int, default=None,
                    help="SMOKE ONLY: override chain length for a CPU "
                         "pipeline validation (mismatched with the "
                         "trained schedule -> image quality is garbage; "
                         "never use for a reported measurement)")
    ap.add_argument("--pilot", action="store_true",
                    help="measure against the SELF-CONSISTENT reduced-"
                         "scale artifact (pilot16_uncond, its own native "
                         "T=64 — see pruned_budget_pilot.py), sized so a "
                         "single CPU core can produce the real curve; "
                         "writes guard_sweep_pilot.json")
    args = ap.parse_args()

    out_json = os.path.join(RESULTS, "guard_sweep.json")
    if args.plot_only:
        make_plot(out_json, os.path.join(RESULTS, "guard_sweep.png"))
        return

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    # The sweep's claim (score vs independent proxy at each budget) is
    # backend-independent; a non-TPU run is a valid measurement that
    # lands in its own file so an on-chip capture can coexist with it.
    backend = jax.default_backend()
    if backend != "tpu":
        out_json = os.path.join(RESULTS, f"guard_sweep_{backend}.json")
        note(f"backend={backend}: writing to {out_json}")

    import bench as _bench
    import experiments.train_artifacts as ta
    from itsd_tpu.core import linear_schedule, sample
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.search import (path_search, pruned_search, random_search,
                                 zero_order_search)
    from itsd_tpu.search.algorithms import (path_search_nfes,
                                             pruned_search_nfes)
    from itsd_tpu.search.verifiers import make_fid_proxy

    if args.pilot:
        import experiments.pruned_budget_pilot as pp
        from itsd_tpu.train.checkpoint import restore_params
        assert not args.T, "--pilot already runs at its native T"
        img, T = pp.IMG, pp.PILOT_T
        model = pp.build_pilot_unet()
        adir = os.path.join(ARTIFACTS, "pilot16_uncond")
        assert os.path.isdir(adir), \
            "run experiments/pruned_budget_pilot.py first (trains it)"
        tmpl = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, img, img, 3), jnp.float32),
                          jnp.zeros((1,), jnp.int32))
        params = restore_params(adir, tmpl)
        clf_dir = os.path.join(ARTIFACTS, "classifier_pilot16")
        out_json = os.path.join(RESULTS, "guard_sweep_pilot.json")
        note(f"PILOT scale: {img}x{img} native T={T} -> {out_json}")
    else:
        img = 32
        params = _bench.load_artifact_params("shapes32_uncond")
        assert params is not None, "artifacts/shapes32_uncond missing"
        model, _ = ta.build_unet("shapes32_uncond")
        T = args.T or ta.TRAIN_T
        clf_dir = os.path.join(ARTIFACTS, "classifier_shapes32")
        if args.T:
            out_json = os.path.join(RESULTS, "guard_sweep_smoke.json")
            note(f"SMOKE T={T}: writing to {out_json}, not the real "
                 "result")
    sched = linear_schedule(1e-4, 0.02, T)
    eps_fn = lambda x, t: model.apply(params, x, t)

    logit_fn, _, _ = load_classifier(clf_dir)
    B = args.batch
    targets = jnp.full((B,), TARGET, jnp.int32)

    def verifier(imgs):
        unit = (imgs + 1.0) / 2.0
        logp = jax.nn.log_softmax(logit_fn(unit), axis=-1)
        return logp[jnp.arange(B), targets].mean()

    images, _ = shapes_dataset(n=2048, img_size=img, num_labels=10,
                               seed=0)
    fid_proxy = make_fid_proxy(jnp.asarray(images[-512:]),
                               pool_hw=4 if args.pilot else 8)
    shape = (B, img, img, 3)
    denoise = lambda noise, k: sample(sched, eps_fn, noise, k)
    jden = jax.jit(denoise)

    # ---- the guard's pooled unsearched baseline (one pool for the sweep)
    report = {}
    if os.path.isfile(out_json):
        with open(out_json) as f:
            report = json.load(f)
    base_vals = report.get("baseline", {}).get("fid_proxy_draws")
    if not base_vals:
        base_vals, base_scores = [], []
        for di in range(args.baseline_draws):
            imgs = jden(jax.random.normal(jax.random.PRNGKey(5000 + di),
                                          shape),
                        jax.random.PRNGKey(6000 + di))
            base_vals.append(float(fid_proxy(imgs)))
            base_scores.append(float(verifier(imgs)))
            note(f"baseline draw {di}: proxy {base_vals[-1]:.3f} "
                 f"score {base_scores[-1]:.4f}")
        report["baseline"] = {
            "fid_proxy_draws": base_vals,
            "fid_proxy_mean": float(np.mean(base_vals)),
            "fid_proxy_std": float(np.std(base_vals)),
            "score_mean": float(np.mean(base_scores)),
            "n_draws": args.baseline_draws,
        }
        _save(out_json, report)

    # ---- budget grids (NFE in full-denoise units = evals / T)
    budgets = {
        "random": [4, 16, 64],
        "zero_order": [1, 4, 16],      # iterations x 4 neighbors
        "path": [4, 16, 64],           # n_paths
        "pruned": [16, 64],            # start width, halving schedule
    }
    if args.quick:
        budgets = {k: v[:1] for k, v in budgets.items()}

    inj = (T // 2, T // 4)
    delta_f = max(2, T // 10)
    ALGO_SALT = {"random": 1, "zero_order": 2, "path": 3, "pruned": 4}

    # Launch sizing: the relay's TPU-worker watchdog kills launches past
    # ~1 min of device time (docs/PERF.md "workload 5"), so nothing here
    # is one giant jitted program. random = chunks of candidates with a
    # host-side running argmax (the product runner's candidate_chunk
    # pattern, runner.py); zero_order = chained 4-iteration chunks (the
    # pivot IS the carry, so re-entry is exact); path/pruned run unjitted
    # so each denoise segment is its own launch.
    RAND_CHUNK = 8
    ZO_CHUNK = 4

    rand_prog = {}

    def run_random(budget, key):
        chunk = min(RAND_CHUNK, budget)
        if chunk not in rand_prog:
            rand_prog[chunk] = jax.jit(
                lambda k: (lambda r: (r.best_score, r.best_images))(
                    random_search(k, shape, denoise, verifier,
                                  n_candidates=chunk, return_images=True)))
        best_s, best_i = -np.inf, None
        for ci in range(budget // chunk):
            s, imgs = rand_prog[chunk](jax.random.fold_in(key, ci))
            s = float(s)
            if s > best_s:
                best_s, best_i = s, imgs
        return best_s, best_i, float(budget)

    zo_prog = {}

    def run_zero_order(budget, key):
        chunk = min(ZO_CHUNK, budget)
        if chunk not in zo_prog:
            zo_prog[chunk] = jax.jit(
                lambda k, init: (lambda r: (r.best_score, r.best_noise))(
                    zero_order_search(k, init, denoise, verifier,
                                      n_neighbors=4, n_iterations=chunk,
                                      neighbor_mode="shell",
                                      lambda_radius=0.9)))
        pivot = jax.random.normal(jax.random.fold_in(key, 9), shape)
        best_s = -np.inf
        for ci in range(budget // chunk):
            s, pivot = zo_prog[chunk](jax.random.fold_in(key, ci), pivot)
            best_s = max(best_s, float(s))
        images = jden(pivot, jax.random.fold_in(key, 1))
        return best_s, images, float(budget * 4 + 1)

    def run_once(algo, budget, key):
        if algo == "random":
            return run_random(budget, key)
        if algo == "zero_order":
            return run_zero_order(budget, key)
        if algo == "path":
            r = path_search(key, sched, eps_fn, verifier, shape,
                            n_paths=budget, n_active=max(1, budget // 4),
                            injection_steps=inj, delta_f=delta_f)
            nfe = path_search_nfes(T, budget, inj, delta_f)
        else:  # pruned successive halving from `budget` starts
            psched = tuple((max(1, t_p * T // ta.TRAIN_T),
                            max(2, budget >> (i + 1)))
                           for i, t_p in enumerate((700, 400, 150)))
            r = pruned_search(key, sched, eps_fn, verifier, shape,
                              n_candidates=budget, prune_schedule=psched)
            nfe = pruned_search_nfes(T, budget, psched)
        return float(r.best_score), r.best_images, float(nfe)

    cells = report.setdefault("cells", [])
    # error cells (relay flap mid-cell) must NOT count as done — drop them
    # so the resumed run re-measures those points (same policy as
    # vit_mfu_probe.py)
    cells[:] = [c for c in cells if "error" not in c]
    done = {(c["algo"], c["budget"], c["seed"]) for c in cells}
    t00 = time.time()
    for algo, buds in budgets.items():
        for budget in buds:
            for seed in range(args.seeds):
                if (algo, budget, seed) in done:
                    continue
                key = jax.random.PRNGKey(17 * budget + 1009 * seed
                                         + ALGO_SALT[algo])
                t0 = time.time()
                try:
                    best_score, best_images, nfe = run_once(algo, budget,
                                                            key)
                except Exception as e:
                    cells.append({"algo": algo, "budget": budget,
                                  "seed": seed,
                                  "error": f"{type(e).__name__}: {e}"})
                    _save(out_json, report)
                    note(f"{algo}-{budget} seed {seed} FAILED: {e}")
                    continue
                cell = {
                    "algo": algo, "budget": budget, "seed": seed,
                    "nfe_full_denoises": round(nfe, 2),
                    "nfe_evals": int(round(nfe * T)),
                    "best_score": float(best_score),
                    "winner_fid_proxy": float(fid_proxy(best_images)),
                    "wall_s": round(time.time() - t0, 1),
                }
                base = report["baseline"]
                cell["guard_ratio_vs_baseline"] = round(
                    cell["winner_fid_proxy"]
                    / max(base["fid_proxy_mean"], 1e-9), 3)
                cells.append(cell)
                _save(out_json, report)
                note(f"{algo}-{budget} seed {seed}: score "
                     f"{cell['best_score']:.4f} proxy "
                     f"{cell['winner_fid_proxy']:.3f} "
                     f"(ratio {cell['guard_ratio_vs_baseline']}) "
                     f"[{cell['wall_s']}s, total {time.time()-t00:.0f}s]")

    report["meta"] = {
        "workload": ("guard sweep: search budget vs verifier score and "
                     "independent FID-proxy; trained "
                     + ("pilot16_uncond (reduced-scale pilot)"
                        if args.pilot else "shapes32_uncond")
                     + f", classifier verifier target {TARGET}, T={T} "
                     f"ancestral, batch {B}/candidate, "
                     f"{args.seeds} seeds/cell"),
        "backend": backend,
        "scale": "pilot" if args.pilot else "full",
        "guard": ("product guard flags winner_proxy > guard_ratio * "
                  "baseline_mean; baseline pooled over "
                  f"{report['baseline']['n_draws']} seeded draws"),
    }
    _save(out_json, report)
    make_plot(out_json, os.path.splitext(out_json)[0] + ".png")


def _save(path, report):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(report, f, indent=1)


def make_plot(json_path, png_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(json_path) as f:
        rep = json.load(f)
    cells = rep["cells"]
    base = rep["baseline"]

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10.5, 4.2), dpi=150)
    for ax in (ax1, ax2):
        ax.grid(True, which="both", color="#e6e3db", lw=0.6, zorder=0)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color("#c9c6bc")
        ax.tick_params(colors="#5d5a52", labelsize=8)
        ax.set_xscale("log")
        ax.set_xlabel("search NFE (full denoises, log)", fontsize=9,
                      color="#3d3a33")

    by_algo = {}
    for c in cells:
        if "error" in c:  # persisted flap records carry no measurements
            continue
        by_algo.setdefault(c["algo"], {}).setdefault(
            c["nfe_full_denoises"], []).append(c)

    for algo, groups in by_algo.items():
        xs = sorted(groups)
        sc = [np.mean([c["best_score"] for c in groups[x]]) for x in xs]
        px = [np.mean([c["winner_fid_proxy"] for c in groups[x]])
              for x in xs]
        px_sd = [np.std([c["winner_fid_proxy"] for c in groups[x]])
                 for x in xs]
        col = COLORS.get(algo, "#5d5a52")
        mk = MARKERS.get(algo, "o")
        ax1.plot(xs, sc, color=col, lw=2, marker=mk, ms=5, zorder=3)
        ax2.errorbar(xs, px, yerr=px_sd, color=col, lw=2, marker=mk, ms=5,
                     capsize=2, zorder=3)
        # selective direct label at the last point
        ax1.annotate(algo.replace("_", "-"), (xs[-1], sc[-1]),
                     textcoords="offset points", xytext=(4, 4),
                     fontsize=8, color="#3d3a33")
        ax2.annotate(algo.replace("_", "-"), (xs[-1], px[-1]),
                     textcoords="offset points", xytext=(4, 4),
                     fontsize=8, color="#3d3a33")

    ax1.set_ylabel("best verifier score (higher = better)", fontsize=9,
                   color="#3d3a33")
    ax1.set_title("Verifier score keeps climbing with budget",
                  fontsize=10, color="#1a1a19", loc="left")

    m, s = base["fid_proxy_mean"], base["fid_proxy_std"]
    ax2.axhspan(m - s, m + s, color="#e6e3db", alpha=0.6, zorder=1)
    ax2.axhline(m, color="#5d5a52", lw=1.2, ls="--", zorder=2)
    ax2.annotate(f"unsearched baseline ({base['n_draws']} draws)",
                 (1.05, m), xycoords=("axes fraction", "data"),
                 fontsize=7.5, color="#5d5a52", rotation=90,
                 va="center", annotation_clip=False)
    gr = rep.get("guard_ratio_line", 1.5)
    ax2.axhline(m * gr, color="#e34948", lw=1.2, ls=":", zorder=2)
    ax2.annotate(f"guard trips ({gr}x)", (0.02, m * gr),
                 xycoords=("axes fraction", "data"),
                 textcoords="offset points", xytext=(0, 3),
                 fontsize=7.5, color="#e34948")
    ax2.set_ylabel("winner FID-proxy (lower = better)", fontsize=9,
                   color="#3d3a33")
    ax2.set_title("...but independent quality degrades past the guard",
                  fontsize=10, color="#1a1a19", loc="left")
    handles = [plt.Line2D([], [], color=COLORS[a], marker=MARKERS[a],
                          lw=2, ms=5, label=a.replace("_", "-"))
               for a in ("random", "zero_order", "path", "pruned")
               if a in by_algo]
    ax2.legend(handles=handles, fontsize=8, frameon=False, loc="best")
    fig.tight_layout()
    fig.savefig(png_path, bbox_inches="tight")
    print(f"wrote {png_path}")


if __name__ == "__main__":
    main()
