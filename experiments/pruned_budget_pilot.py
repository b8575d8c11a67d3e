"""REDUCED-SCALE pilot of the pruned-search equal-NFE question, sized so
a single CPU core can measure it honestly.

`experiments/pruned_budget.py` (queued behind the TPU relay) asks: does
successive-halving over noise beat best-of-N at the same NFE? That claim
is about SEARCH DYNAMICS, not hardware, so it pilots at reduced scale —
what must NOT be reduced is self-consistency: the model is *trained at
its own native T* and searched at that same T (running the shapes32
T=1000 artifact with a truncated schedule would score garbage, which is
why pruned_budget.py's --T flag is smoke-only).

This script therefore trains its own tiny self-consistent artifact
(16x16 shapes, ch=16 UNet, T=64, EMA) plus a 16x16 classifier verifier,
then runs the exact pruned_budget protocol against it:

  - E[best verifier score], pruned 16 -> 8 -> 4 -> 2 (schedule scaled
    from the full-run's (700,8),(400,4),(150,2) by T/1000)
  - E[best] for random best-of-N at the SAME NFE (bootstrap over the
    measured 16-candidate pools)
  - E[best] for full best-of-16 (~2x the NFE)
  - the independent FID-proxy of each winner (verifier-hacking check)

Results are labeled scale=pilot and land in their own file; the
full-scale on-chip run stays the authoritative number when the relay
returns. Resumable: training checkpoints by artifact dir, measurement
by per-seed rows in the output JSON.

Usage: python experiments/pruned_budget_pilot.py [--seeds 20]
Writes: docs/results/pruned_budget_pilot.json
        artifacts/pilot16_uncond/ + artifacts/classifier_pilot16/
"""

from __future__ import annotations

import argparse
import functools
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

IMG = 16
PILOT_T = 64
N_START = 16
# the full run's prune points (700,8),(400,4),(150,2) scaled by T/1000
PSCHED = ((45, 8), (26, 4), (10, 2))


def note(m):
    print(f"[pilot] {m}", file=sys.stderr, flush=True)


def build_pilot_unet():
    from itsd_tpu.models import UNet, uncond_unet_config
    cfg = uncond_unet_config(ch=16, ch_mult=(1, 2), attn=(),
                             num_res_blocks=1, dropout=0.0, T=PILOT_T,
                             time_embed="functional", dtype="float32")
    return UNet(cfg)


def train_pilot_diffusion(steps, batch, seed=0):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from itsd_tpu.core import linear_schedule
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer, make_train_step)
    from itsd_tpu.train.checkpoint import save_params

    model = build_pilot_unet()
    images, _ = shapes_dataset(n=2048, img_size=IMG, num_labels=10,
                               seed=seed)
    sched = linear_schedule(1e-4, 0.02, PILOT_T)

    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                        jnp.zeros((2,), jnp.int32))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(params))
    note(f"pilot16_uncond: {n_params/1e6:.2f}M params, T={PILOT_T}, "
         f"{steps} steps @ batch {batch}")

    tx = make_optimizer(OptimizerConfig(
        lr=2e-4, epochs=max(1, steps * batch // len(images)),
        steps_per_epoch=len(images) // batch, ema_decay=0.999))
    state = create_train_state(params, tx, ema=True)
    step_fn = make_train_step(
        lambda p, *aa, **kw: model.apply(p, *aa, **kw), sched, tx,
        conditional=False, ema_decay=0.999, donate=False)

    xs = jnp.asarray(images)
    key = jax.random.PRNGKey(seed + 1)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fit_chunk(state, xs, idx_chunk, keys_chunk):
        def body(st, inp):
            bidx, skey = inp
            st, metrics = step_fn(st, {"image": jnp.take(xs, bidx, 0)},
                                  skey)
            return st, metrics["loss"]
        return lax.scan(body, state, (idx_chunk, keys_chunk))

    t0 = time.time()
    chunk, done = 100, 0
    loss0 = lossN = None
    while done < steps:
        n_now = min(chunk, steps - done)
        idx = jnp.asarray(np.random.default_rng(seed * 7919 + done)
                          .integers(0, len(images), size=(n_now, batch)),
                          jnp.int32)
        keys = jax.random.split(jax.random.fold_in(key, done), n_now)
        state, losses = fit_chunk(state, xs, idx, keys)
        done += n_now
        if loss0 is None:
            loss0 = float(losses[0])
        lossN = float(losses[-1])
        note(f"train step {done}/{steps} loss {lossN:.4f} "
             f"({done/(time.time()-t0):.1f} steps/s)")

    out = os.path.join(ARTIFACTS, "pilot16_uncond")
    save_params(out, jax.device_get(state.ema_params))
    with open(out + ".json", "w") as f:
        json.dump({"arch": {"img": IMG, "ch": 16, "ch_mult": [1, 2],
                            "attn": [], "num_res_blocks": 1},
                   "train_T": PILOT_T, "steps": steps, "batch": batch,
                   "loss_first": loss0, "loss_final": lossN, "ema": True,
                   "wall_s": round(time.time() - t0, 1)}, f, indent=1)
    note(f"pilot16_uncond saved (loss {loss0:.3f} -> {lossN:.3f})")


def train_pilot_classifier(seed=0):
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.models import (ClassifierConfig, save_classifier,
                                 train_classifier)
    images, labels = shapes_dataset(n=4096, img_size=IMG, num_labels=10,
                                    seed=seed)
    _, params, acc = train_classifier(
        images, labels, ClassifierConfig(num_classes=10, ch=16, depth=3),
        epochs=30, batch_size=256, seed=seed)
    out = os.path.join(ARTIFACTS, "classifier_pilot16")
    save_classifier(out, params)
    with open(out + ".json", "w") as f:
        json.dump({"num_classes": 10, "ch": 16, "depth": 3,
                   "train_acc_512": acc, "dataset": f"shapes{IMG}"}, f,
                  indent=1)
    note(f"classifier_pilot16 saved (train acc {acc:.3f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--train-steps", type=int, default=800)
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    os.makedirs(ARTIFACTS, exist_ok=True)
    if not os.path.isdir(os.path.join(ARTIFACTS, "pilot16_uncond")):
        train_pilot_diffusion(args.train_steps, batch=64)
    if not os.path.isdir(os.path.join(ARTIFACTS, "classifier_pilot16")):
        train_pilot_classifier()

    from itsd_tpu.core import linear_schedule, sample
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.search import pruned_search, random_search
    from itsd_tpu.search.algorithms import pruned_search_nfes
    from itsd_tpu.search.verifiers import classifier_verifier, \
        make_fid_proxy
    from itsd_tpu.train.checkpoint import restore_params

    model = build_pilot_unet()
    tmpl = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                      jnp.zeros((1,), jnp.int32))
    params = restore_params(os.path.join(ARTIFACTS, "pilot16_uncond"),
                            tmpl)
    sched = linear_schedule(1e-4, 0.02, PILOT_T)
    eps_fn = lambda x, t: model.apply(params, x, t)

    logit_fn, _, _ = load_classifier(
        os.path.join(ARTIFACTS, "classifier_pilot16"))
    B = args.batch
    targets = jnp.full((B,), TARGET, jnp.int32)
    verifier = classifier_verifier(logit_fn, targets)
    shape = (B, IMG, IMG, 3)

    images, _ = shapes_dataset(n=2048, img_size=IMG, num_labels=10,
                               seed=0)
    fid_proxy = make_fid_proxy(jnp.asarray(images[-512:]), pool_hw=4)

    nfe_pruned = pruned_search_nfes(sched.T, N_START, PSCHED)
    note(f"pruned NFE = {nfe_pruned} full-denoise units "
         f"(best-of-16 = 16)")

    denoise = lambda noise, k: sample(sched, eps_fn, noise, k)
    run_pruned = jax.jit(lambda k: pruned_search(
        k, sched, eps_fn, verifier, shape, n_candidates=N_START,
        prune_schedule=PSCHED).best_images)

    @jax.jit
    def run_pool(k):
        r = random_search(k, shape, denoise, verifier,
                          n_candidates=N_START, return_images=True)
        return r.history["scores"], r.best_images

    path = os.path.join(RESULTS, "pruned_budget_pilot.json")
    rows = {"pruned": [], "bestof16": []}
    pool_scores_all = []
    if os.path.isfile(path):
        with open(path) as f:
            prev = json.load(f)
        if prev.get("seeds_done", 0):
            rows = prev["per_seed"]
            pool_scores_all = [np.asarray(p, np.float64)
                               for p in prev["pool_scores"]]
            note(f"resuming at seed {len(pool_scores_all)}")

    t0 = time.time()

    def save(complete):
        summary = {
            "workload": ("PILOT (reduced scale): pruned successive-"
                         "halving vs best-of-N at equal NFE; "
                         f"self-consistent pilot16_uncond (T={PILOT_T}, "
                         f"{IMG}x{IMG} shapes, ch=16, EMA), classifier "
                         f"verifier target {TARGET}, {args.seeds} seeds"),
            "scale": "pilot",
            "backend": jax.default_backend(),
            "authoritative_full_scale_run": "pruned_budget.json "
            "(queued in experiments/tpu_window.py)",
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
            pools = np.stack(pool_scores_all)
            rng = np.random.default_rng(0)

            def ebest_at(n):
                idx = rng.integers(0, pools.shape[1],
                                   size=(400, pools.shape[0], n))
                return float(np.nanmax(
                    np.take_along_axis(pools[None].repeat(400, 0), idx,
                                       axis=2), axis=2).mean())

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
        os.makedirs(RESULTS, exist_ok=True)
        with open(path, "w") as f:
            json.dump(summary, f, indent=1)
        return summary

    for s in range(len(pool_scores_all), args.seeds):
        k = jax.random.PRNGKey(1000 + s)
        imgs_p = run_pruned(k)
        sp = float(verifier(imgs_p))
        rows["pruned"].append({"score": sp,
                               "fid_proxy": fid_proxy(imgs_p)})
        scores, imgs_b = run_pool(jax.random.fold_in(k, 1))
        scores = np.asarray(scores)
        pool_scores_all.append(scores)
        rows["bestof16"].append({"score": float(np.nanmax(scores)),
                                 "fid_proxy": fid_proxy(
                                     np.asarray(imgs_b))})
        save(complete=False)
        note(f"seed {s}: pruned {sp:.4f} vs best-of-16 "
             f"{rows['bestof16'][-1]['score']:.4f} "
             f"({time.time()-t0:.0f}s)")

    summary = save(complete=True)
    note(json.dumps(summary["E_best"]))
    note(f"-> {path}")


if __name__ == "__main__":
    main()
