"""Autoguidance (Karras et al. 2024, arXiv 2406.02507) vs CFG, measured
on the trained conditional artifact.

`diffusion.guidance=auto` mixes (1+w)*eps_strong - w*eps_weak with BOTH
forwards conditional: the weak model is an UNDER-TRAINED twin of the
strong one (shapes64_cond_weak, same arch/data/protocol at 1/8 the
steps), so extrapolating away from it subtracts the strong model's own
amplified errors instead of the unconditional direction. Same
2-evals/step cost as CFG.

Protocol = experiments/cfg_interval.py EXACTLY (same rig, same keys, same
metrics: 60 samples/arm = 6 per class, class-control accuracy under the
independent classifier_shapes64, pooled-pixel FID-proxy vs held-out
reals, 3 seeds) — so the cond_w0 / cfg_w1.8 anchor arms here reproduce
cfg_interval.json's cond_w0 / full rows bit-for-bit (same compiled
programs, same keys), and the autoguidance arms land on a comparable
scale.

Arms: cond_w0 (strong only, T evals), cfg_w1.8 (2T evals),
      auto_w{0.5, 1.0, 1.8} (2T evals).

Usage: python experiments/autoguidance.py [--seeds 3]
Writes: docs/results/autoguidance.json (+ _smoke / _<backend> variants)
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
AUTO_WS = (0.5, 1.0, 1.8)


def note(m):
    print(f"[autoguidance] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--per-class", type=int, default=6)
    ap.add_argument("--weak-name", default="shapes64_cond_weak",
                    help="weak-model artifact (Karras et al.: the weak "
                         "model must be weak but NOT too weak — sweep "
                         "training-length twins with this + --tag)")
    ap.add_argument("--tag", default="",
                    help="suffix for the auto arm keys, e.g. '_mid' when "
                         "measuring a longer-trained weak twin; results "
                         "merge into the same file beside the anchors")
    ap.add_argument("--T", type=int, default=None,
                    help="SMOKE ONLY: shortened chain, random weights")
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import experiments.train_artifacts as ta
    from itsd_tpu.core import (denoise_segment, linear_schedule,
                               make_autoguidance_eps_fn, make_cfg_eps_fn)
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.metrics import frechet_distance, gaussian_stats
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.search.verifiers import adaptive_avg_pool
    from itsd_tpu.train.checkpoint import restore_params
    from itsd_tpu.utils.images import save_image_grid

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
    params_w = load(args.weak_name, 1)
    logit_fn, _, _ = load_classifier(
        os.path.join(ARTIFACTS, "classifier_shapes64"))

    images, _ = shapes_dataset(n=2048, img_size=64, num_labels=10, seed=0)
    hold = (np.asarray(images[-512:]) + 1.0) / 2.0
    mu_r, sig_r = gaussian_stats(np.asarray(
        adaptive_avg_pool(jnp.asarray(hold), 8).reshape(len(hold), -1)))

    req = np.repeat(np.arange(10), args.per_class)
    lab_plus1 = jnp.asarray(req + 1, jnp.int32)
    B = len(req)
    strong_eps = lambda xx, tt, ll: model.apply(params_s, xx, tt, ll)
    weak_eps = lambda xx, tt, ll: model.apply(params_w, xx, tt, ll)

    from functools import partial

    SEG = min(8, T)
    edges = sorted({round(T * i / SEG) for i in range(SEG, -1, -1)},
                   reverse=True)
    seg_bounds = list(zip(edges[:-1], edges[1:]))

    # the EXACT cfg_interval.py segment program (traced w/lo/hi): the
    # anchor arms ride the already-compiled cache entries and reproduce
    # cfg_interval.json's cond_w0/full rows on identical keys
    @partial(jax.jit, static_argnames=("t_from", "t_to"))
    def run_seg_cfg(x, k, w, lo, hi, t_from, t_to):
        eps_fn = make_cfg_eps_fn(strong_eps, lab_plus1, w,
                                 interval=(lo, hi))
        return denoise_segment(sched, eps_fn, x, k, t_from, t_to,
                               return_key=True)

    @partial(jax.jit, static_argnames=("t_from", "t_to"))
    def run_seg_auto(x, k, w, t_from, t_to):
        eps_fn = make_autoguidance_eps_fn(strong_eps, weak_eps,
                                          lab_plus1, w)
        return denoise_segment(sched, eps_fn, x, k, t_from, t_to,
                               return_key=True)

    def chain(runner_args):
        def run(noise, k):
            x = noise
            for t_from, t_to in seg_bounds:
                x, k = runner_args(x, k, t_from, t_to)
            return jnp.clip(x, -1.0, 1.0)
        return run

    runners = {
        "cond_w0": chain(lambda x, k, a, b: run_seg_cfg(
            x, k, 0.0, 0, 0, a, b)),
        f"cfg_w{CFG_W}": chain(lambda x, k, a, b: run_seg_cfg(
            x, k, CFG_W, 0, T, a, b)),
    }
    evals = {"cond_w0": T, f"cfg_w{CFG_W}": 2 * T}
    for w in AUTO_WS:
        name = f"auto{args.tag}_w{w}"
        runners[name] = chain(lambda x, k, a, b, w=w: run_seg_auto(
            x, k, float(w), a, b))
        evals[name] = 2 * T

    backend = jax.default_backend()
    path = os.path.join(
        RESULTS,
        "autoguidance_smoke.json" if args.T
        else ("autoguidance.json" if backend == "tpu"
              else f"autoguidance_{backend}.json"))

    rows = {name: [] for name in runners}
    weak_map = {}
    if os.path.isfile(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("backend") == backend:
            for k, v in prev.get("per_seed", {}).items():
                rows.setdefault(k, []).extend(
                    x for x in v if x not in rows.get(k, []))
            weak_map = prev.get("weak_models", {})
            note(f"resuming from {path}")
    weak_map[args.tag or "default"] = args.weak_name

    t0 = time.time()

    def save(complete):
        summary = {
            "workload": ("autoguidance (strong shapes64_cond vs weak "
                         "1/8-steps twin) vs CFG on the cfg_interval.py "
                         f"rig: T={T} ancestral, {B} samples/arm, "
                         f"{args.seeds} seeds, identical keys"),
            "weak_models": weak_map,  # arm tag -> weak artifact
            "backend": backend,
            "complete": complete,
            "wall_s": round(time.time() - t0, 1),
            "per_seed": rows,
            "arms": {},
        }
        for name in sorted(rows):
            rs = rows[name]
            if not rs:
                continue
            summary["arms"][name] = {
                # merged arms from another --tag run keep their cost: every
                # guided arm is 2T, the lone cond anchor is T
                "model_evals_per_image": evals.get(
                    name, T if name == "cond_w0" else 2 * T),
                "n_seeds": len(rs),
                "class_control_acc": float(np.mean(
                    [r["acc"] for r in rs])),
                "class_control_acc_std": float(np.std(
                    [r["acc"] for r in rs])),
                "fid_proxy": float(np.mean([r["fid_proxy"] for r in rs])),
                "fid_proxy_std": float(np.std(
                    [r["fid_proxy"] for r in rs])),
                "wall_s_per_chain": float(np.median(
                    [r["wall_s"] for r in rs])),
            }
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    for s in range(args.seeds):
        for name, run in runners.items():
            if len(rows[name]) > s:
                continue
            noise = jax.random.normal(jax.random.PRNGKey(100 + s),
                                      (B, 64, 64, 3))
            tw = time.time()
            imgs = run(noise, jax.random.PRNGKey(200 + s))
            jax.block_until_ready(imgs)
            wall = time.time() - tw
            unit = (np.asarray(imgs, np.float32) + 1.0) / 2.0
            pred = np.asarray(jnp.argmax(logit_fn(jnp.asarray(unit)), -1))
            mu_f, sig_f = gaussian_stats(np.asarray(
                adaptive_avg_pool(jnp.asarray(unit), 8).reshape(B, -1)))
            rows[name].append({
                "acc": float((pred == req).mean()),
                "fid_proxy": float(frechet_distance(mu_r, sig_r,
                                                    mu_f, sig_f)),
                "wall_s": round(wall, 2),
            })
            if s == 0 and not args.T:
                save_image_grid(np.asarray(imgs),
                                os.path.join(RESULTS,
                                             f"autoguidance_{name}.png"),
                                nrow=args.per_class)
            save(complete=False)
            note(f"seed {s} {name}: acc {rows[name][-1]['acc']:.3f} "
                 f"fid {rows[name][-1]['fid_proxy']:.2f} "
                 f"wall {wall:.1f}s")
    summary = save(complete=True)
    note(json.dumps(summary["arms"], indent=1))
    note(f"-> {path}")


if __name__ == "__main__":
    main()
