"""Interval-restricted CFG measured on the trained conditional artifact.

`diffusion.cfg_interval=[lo,hi]` (Kynkaanniemi et al. 2024) runs the
dual-batched guidance forward only for lo <= t < hi; outside, ONE
conditional forward under `lax.cond`. Two claims to measure, not assert:

  1. quality: where in the chain does guidance actually pay? Arms at the
     same w compare full-range vs low-t / mid / high-t halves on
     class-control accuracy (independent classifier) + population
     FID-proxy vs held-out real features.
  2. cost: the untaken cond branch must be genuinely free — wall-clock
     per chain should track cfg_nfes (1500 evals for a half-interval vs
     2000 full), not stay at dual-batch cost.

Artifact: shapes64_cond (T=1000, EMA) + classifier_shapes64, both
committed. Resumable per (arm, seed); 3 seeds x B=60 (6 per class).

Usage: python experiments/cfg_interval.py [--seeds 3]
Writes: docs/results/cfg_interval.json (+ _smoke / _<backend> variants)
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
W = 1.8


def note(m):
    print(f"[cfg_interval] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--per-class", type=int, default=6)
    ap.add_argument("--T", type=int, default=None,
                    help="SMOKE ONLY: shorten the chain (mismatched with "
                         "the trained schedule -> quality numbers are "
                         "meaningless; pipeline validation only)")
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import experiments.train_artifacts as ta
    from itsd_tpu.core import cfg_nfes, linear_schedule, make_cfg_eps_fn
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.metrics import frechet_distance, gaussian_stats
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.search.verifiers import adaptive_avg_pool
    from itsd_tpu.train.checkpoint import restore_params
    from itsd_tpu.utils.images import save_image_grid

    T = args.T or ta.TRAIN_T
    sched = linear_schedule(1e-4, 0.02, T)
    # EXACTLY the artifact's architecture (functional time embedding etc.)
    model, _ = ta.build_unet("shapes64_cond")
    if args.T:
        # SMOKE: shortened chain, random init — pipeline check only.
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, 64, 64, 3)),
                            jnp.zeros((2,), jnp.int32),
                            jnp.zeros((2,), jnp.int32))
    else:
        params = restore_params(os.path.join(ARTIFACTS, "shapes64_cond"))
        params = jax.tree.map(
            lambda p: jnp.asarray(p, jnp.float32)
            if getattr(p, "dtype", None) == jnp.bfloat16 else jnp.asarray(p),
            params)
    logit_fn, _, _ = load_classifier(
        os.path.join(ARTIFACTS, "classifier_shapes64"))

    images, _ = shapes_dataset(n=2048, img_size=64, num_labels=10, seed=0)
    hold = (np.asarray(images[-512:]) + 1.0) / 2.0
    mu_r, sig_r = gaussian_stats(np.asarray(
        adaptive_avg_pool(jnp.asarray(hold), 8).reshape(len(hold), -1)))

    req = np.repeat(np.arange(10), args.per_class)
    lab_plus1 = jnp.asarray(req + 1, jnp.int32)
    B = len(req)
    model_eps = lambda xx, tt, ll: model.apply(params, xx, tt, ll)

    def iv(lo_frac, hi_frac):
        return (int(lo_frac * T), int(hi_frac * T))

    # "cond_w0": with cfg_combine = (1+w)*eps_cond - w*eps_uncond, w=0 is a
    # pure CONDITIONAL forward (one cond eval/step) — NOT unconditional
    # sampling; its ~0.37 class-control acc vs 0.1 chance confirms the
    # conditioning is active. (Renamed from the misleading "uncond_w0".)
    ARMS = [
        ("cond_w0", 0.0, None),
        ("full", W, None),
        ("low_t_half", W, iv(0.0, 0.5)),
        ("mid_half", W, iv(0.25, 0.75)),
        ("high_t_half", W, iv(0.5, 1.0)),
    ]

    # ONE compiled program family for every arm: w/lo/hi ride as TRACED
    # scalars through make_cfg_eps_fn (the chain's cond structure is
    # interval-independent), so the 5-arm sweep shares compiles instead of
    # paying five. The chain itself runs as SEG host-chained
    # denoise_segment launches (carried key => bit-identical to one
    # `sample` call) to stay under the TPU-worker watchdog that killed a
    # single T=1000 launch live (same failure mode the flagship search hit;
    # product knob: diffusion.launch_segments).
    from functools import partial

    from itsd_tpu.core import denoise_segment

    SEG = min(8, T)

    @partial(jax.jit, static_argnames=("t_from", "t_to"))
    def run_seg(x, k, w, lo, hi, t_from, t_to):
        eps_fn = make_cfg_eps_fn(model_eps, lab_plus1, w, interval=(lo, hi))
        return denoise_segment(sched, eps_fn, x, k, t_from, t_to,
                               return_key=True)

    seg_bounds = []
    # dedupe rounded edges: for small smoke T (e.g. --T 6 with SEG=8 before
    # the min() clamp) duplicates would violate denoise_segment's
    # `t_to < t_from` contract (ADVICE r4)
    edges = sorted({round(T * i / SEG) for i in range(SEG, -1, -1)},
                   reverse=True)
    for a_t, b_t in zip(edges[:-1], edges[1:]):
        seg_bounds.append((a_t, b_t))

    def run_chain(noise, k, w, lo, hi):
        x = noise
        for t_from, t_to in seg_bounds:
            x, k = run_seg(x, k, w, lo, hi, t_from, t_to)
        return jnp.clip(x, -1.0, 1.0)

    def arm_args(w, interval):
        if w == 0.0:
            return 0.0, 0, 0          # never active: ONE cond forward/step
        if interval is None:
            return w, 0, T            # always active: full-range CFG
        return float(w), int(interval[0]), int(interval[1])

    runners = {}
    for name, w, interval in ARMS:
        _a = arm_args(w, interval)
        runners[name] = lambda noise, k, _a=_a: run_chain(noise, k, *_a)

    backend = jax.default_backend()
    path = os.path.join(
        RESULTS,
        "cfg_interval_smoke.json" if args.T
        else ("cfg_interval.json" if backend == "tpu"
              else f"cfg_interval_{backend}.json"))

    rows = {name: [] for name, _, _ in ARMS}
    if os.path.isfile(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("backend") == backend:
            for k, v in prev.get("per_seed", {}).items():
                if k == "uncond_w0":  # pre-rename key: same arm, migrate
                    k = "cond_w0"
                rows.setdefault(k, []).extend(
                    x for x in v if x not in rows.get(k, []))
            note(f"resuming from {path}")

    t0 = time.time()

    def save(complete):
        summary = {
            "workload": (f"interval-restricted CFG on trained shapes64_cond"
                         f" (T={T} ancestral, w={W}, {B} samples/arm, "
                         f"{args.seeds} seeds); arms guide full chain vs "
                         "low-t/mid/high-t halves"),
            "backend": backend,
            "complete": complete,
            "wall_s": round(time.time() - t0, 1),
            "per_seed": rows,
            "arms": {},
        }
        for name, w, interval in ARMS:
            rs = rows[name]
            if not rs:
                continue
            summary["arms"][name] = {
                "w": w,
                "interval": list(interval) if interval else None,
                "model_evals_per_image": (cfg_nfes(T, interval) if w else T),
                "n_seeds": len(rs),
                "class_control_acc": float(np.mean(
                    [r["acc"] for r in rs])),
                "class_control_acc_std": float(np.std(
                    [r["acc"] for r in rs])),
                "fid_proxy": float(np.mean([r["fid_proxy"] for r in rs])),
                "fid_proxy_std": float(np.std(
                    [r["fid_proxy"] for r in rs])),
                # median: robust to BOTH the seed-0 compile wall and
                # mid-run recompiles (a relay cache miss put a 636 s wall
                # on one warm-seed low_t_half chain in the round-5 run)
                "wall_s_per_chain": float(np.median(
                    [r["wall_s"] for r in rs])),
            }
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    for s in range(args.seeds):
        for name, w, interval in ARMS:
            if len(rows[name]) > s:
                continue
            noise = jax.random.normal(jax.random.PRNGKey(100 + s),
                                      (B, 64, 64, 3))
            tw = time.time()
            imgs = runners[name](noise, jax.random.PRNGKey(200 + s))
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
                                             f"cfg_interval_{name}.png"),
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
