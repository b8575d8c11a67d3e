"""Optimal NFE allocation: fast ODE solver x search beats either axis alone.

The paper (arXiv 2501.09732) argues the denoising-step axis saturates and the
search axis keeps paying. This experiment closes the loop the paper leaves
open: at a FIXED total budget of model evaluations, what is the best way to
*spend* it? A second-order solver (DPM-Solver++(2M), `core/sampling.py`)
produces a candidate in ~20 evals instead of the ancestral sampler's T=200,
so the same budget buys 10x the search candidates — if (and this is the
empirical question) per-candidate quality holds up.

Protocol (all on one v5e chip, everything jitted):
  1. shapes dataset + CNN classifier verifier + DDPM UNet trained on-chip
     (same recipe as experiments/nfe_scaling.py),
  2. candidate pools from the same checkpoint with three samplers:
     ancestral T=200 (N=64), DDIM-50 (N=256), DPM-Solver++-20 (N=512),
  3. pool-quality sanity: mean verifier score and FID-proxy per sampler
     (detects "the fast solver makes junk" before comparing searches),
  4. for each eval budget E in {200..6400}: bootstrap E[max of N] where
     N = E / cost(sampler), plot the three allocation curves.

Writes docs/results/budget_allocation.jsonl + budget_allocation.png.

Usage: python experiments/budget_allocation.py [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from itsd_tpu.core import (ddim_sample, dpm_solver_sample, linear_schedule,
                           sample)
from itsd_tpu.data import BatchIterator, shapes_dataset
from itsd_tpu.metrics import frechet_distance, gaussian_stats
from itsd_tpu.models import UNet, uncond_unet_config
from itsd_tpu.models.classifier import ClassifierConfig, train_classifier
from itsd_tpu.search.verifiers import adaptive_avg_pool
from itsd_tpu.train import (OptimizerConfig, create_train_state,
                            make_optimizer, make_train_step)

# validated categorical palette (dataviz reference instance, slots 1-3)
C_ANC, C_DDIM, C_DPM = "#2a78d6", "#eb6834", "#1baf7a"


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--train-steps", type=int, default=3000)
    p.add_argument("--T", type=int, default=200)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--img", type=int, default=32)
    p.add_argument("--n-data", type=int, default=8192)
    p.add_argument("--cand-batch", type=int, default=4)
    p.add_argument("--outdir", default="docs/results")
    return p.parse_args()


def main():
    a = parse_args()
    if a.quick:
        a.train_steps, a.T, a.batch = 60, 16, 32
        a.n_data, a.img = 512, 16
    os.makedirs(a.outdir, exist_ok=True)
    jsonl = open(os.path.join(a.outdir, "budget_allocation.jsonl"), "w")

    def emit(rec):
        rec = {k: (float(v) if isinstance(v, (np.floating, jnp.ndarray))
                   else v) for k, v in rec.items()}
        jsonl.write(json.dumps(rec) + "\n")
        jsonl.flush()
        print(json.dumps(rec))

    # ------------------------------------------- data + classifier verifier
    images, labels = shapes_dataset(n=a.n_data, img_size=a.img, seed=0)
    n_hold = max(64, a.n_data // 8)
    hold_unit = (images[:n_hold] + 1.0) / 2.0
    tr_images, tr_labels = images[n_hold:], labels[n_hold:]
    n_cls = min(len(tr_images), 4096)
    logit_fn, _, acc = train_classifier(
        tr_images[:n_cls], tr_labels[:n_cls],
        ClassifierConfig(ch=16 if a.quick else 32),
        epochs=2 if a.quick else 8)
    hold_pred = np.asarray(jnp.argmax(logit_fn(jnp.asarray(hold_unit)), -1))
    emit({"phase": "classifier", "train_acc": acc,
          "holdout_acc": float((hold_pred == labels[:n_hold]).mean())})

    def verifier_per_candidate(imgs_folded, n_cand):
        """[N*B,H,W,C] in [-1,1] -> per-candidate scores [N]."""
        unit = (imgs_folded + 1.0) / 2.0
        logp = jax.nn.log_softmax(logit_fn(unit), axis=-1)
        per_img = jnp.max(logp, axis=-1)
        return per_img.reshape(n_cand, -1).mean(axis=1)

    # --------------------------------------------------------- train DDPM
    ucfg = uncond_unet_config(
        ch=32 if a.quick else 64, ch_mult=(1, 2) if a.quick else (1, 2, 2),
        attn=(1,), num_res_blocks=1 if a.quick else 2, dropout=0.1,
        dtype="bfloat16")
    model = UNet(ucfg)
    sched = linear_schedule(1e-4, 0.02, a.T)
    it = BatchIterator(tr_images, None, a.batch, seed=0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, a.img, a.img, 3)),
                        jnp.zeros((2,), jnp.int32))
    steps_per_epoch = max(len(it), 1)
    tx = make_optimizer(OptimizerConfig(
        lr=2e-4, epochs=max(1, a.train_steps // steps_per_epoch + 1),
        steps_per_epoch=steps_per_epoch))
    state = create_train_state(params, tx)
    step = make_train_step(lambda p, *ar, **kw: model.apply(p, *ar, **kw),
                           sched, tx)
    key = jax.random.PRNGKey(1)
    t0, n, losses = time.time(), 0, []
    while n < a.train_steps:
        for batch in it:
            key, sk = jax.random.split(key)
            state, m = step(state, {"image": jnp.asarray(batch["image"])},
                            sk)
            losses.append(m["loss"])
            n += 1
            if n >= a.train_steps:
                break
    losses = [float(x) for x in jax.device_get(losses)]
    emit({"phase": "train", "steps": n,
          "loss_last20": round(float(np.mean(losses[-20:])), 4),
          "seconds": round(time.time() - t0, 1)})
    eparams = state.ema_params if state.ema_params is not None else \
        state.params
    eps_fn = lambda x, t: model.apply(eparams, x, t)

    B = a.cand_batch
    mu_r, sig_r = gaussian_stats(np.asarray(
        adaptive_avg_pool(jnp.asarray(hold_unit), 8)
        .reshape(n_hold, -1)))

    # -------------------------------------------------- candidate pools
    # cost = model evals per candidate; pool = total candidates generated
    if a.quick:
        samplers = {
            "ancestral": (a.T, 8, lambda x, k: sample(sched, eps_fn, x, k)),
            "dpm": (4, 16, lambda x, k: dpm_solver_sample(
                sched, eps_fn, x, k, num_steps=4)),
        }
    else:
        samplers = {
            "ancestral": (a.T, 64,
                          lambda x, k: sample(sched, eps_fn, x, k)),
            "ddim50": (50, 256, lambda x, k: ddim_sample(
                sched, eps_fn, x, k, num_steps=50)),
            "dpm20": (20, 512, lambda x, k: dpm_solver_sample(
                sched, eps_fn, x, k, num_steps=20)),
        }

    chunk = 8 if a.quick else 64      # candidates per device launch
    pools = {}                        # name -> (cost, scores[pool])
    for si, (name, (cost, pool_n, denoise)) in enumerate(samplers.items()):
        t0 = time.time()

        @jax.jit
        def gen_chunk(k, _d=denoise):
            noise = jax.random.normal(k, (chunk * B, a.img, a.img, 3))
            k2 = jax.random.fold_in(k, 1)
            imgs = _d(noise, k2)
            scores = verifier_per_candidate(imgs, chunk)
            unit = (imgs + 1.0) / 2.0
            feats = adaptive_avg_pool(unit, 8).reshape(imgs.shape[0], -1)
            return scores, feats

        sc, ft = [], []
        for ci in range(pool_n // chunk):
            # stable per-(sampler, chunk) key — hash(name) is salted per
            # process and would make the committed results irreproducible
            s, f = gen_chunk(jax.random.fold_in(jax.random.PRNGKey(7 + ci),
                                                si))
            sc.append(np.asarray(s))
            ft.append(np.asarray(f))
        scores = np.concatenate(sc)
        feats = np.concatenate(ft)
        mu_f, sig_f = gaussian_stats(feats)
        pools[name] = (cost, scores)
        emit({"phase": "pool", "sampler": name, "evals_per_candidate": cost,
              "pool": pool_n, "score_mean": round(float(scores.mean()), 4),
              "score_std": round(float(scores.std()), 4),
              "fid_proxy": round(float(frechet_distance(
                  mu_r, sig_r, mu_f, sig_f)), 3),
              "seconds": round(time.time() - t0, 1)})

    # ------------------------------------- fixed-budget allocation curves
    budgets = ([16, 32, 64] if a.quick
               else [200, 400, 800, 1600, 3200, 6400])
    rng = np.random.default_rng(0)
    for name, (cost, scores) in pools.items():
        pool_n = len(scores)
        for E in budgets:
            N = E // cost
            if N < 1 or N > pool_n:
                continue
            boots = [scores[rng.choice(pool_n, N, replace=False)].max()
                     for _ in range(300)]
            emit({"phase": "allocation", "sampler": name, "budget_evals": E,
                  "n_candidates": N,
                  "score_mean_of_max": round(float(np.mean(boots)), 4),
                  "score_std": round(float(np.std(boots)), 4)})

    jsonl.close()
    make_plot(os.path.join(a.outdir, "budget_allocation.jsonl"),
              os.path.join(a.outdir, "budget_allocation.png"))
    print("wrote", os.path.join(a.outdir, "budget_allocation.png"))


def make_plot(jsonl_path, png_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    recs = [json.loads(l) for l in open(jsonl_path)]
    alloc = [r for r in recs if r["phase"] == "allocation"]
    series = [("ancestral", C_ANC, "o", "ancestral T=200 best-of-N"),
              ("ddim50", C_DDIM, "s", "DDIM-50 best-of-N"),
              ("dpm20", C_DPM, "^", "DPM-Solver++-20 best-of-N")]

    fig, ax = plt.subplots(figsize=(6.4, 4.4), dpi=150)
    ax.grid(True, which="both", color="#e6e3db", lw=0.6, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    ax.set_axisbelow(True)

    for name, color, marker, label in series:
        rs = sorted([r for r in alloc if r["sampler"] == name],
                    key=lambda r: r["budget_evals"])
        if not rs:
            continue
        ax.plot([r["budget_evals"] for r in rs],
                [r["score_mean_of_max"] for r in rs],
                color=color, lw=2, marker=marker, ms=6, label=label,
                zorder=3)
    ax.set_xscale("log")
    ax.set_xlabel("total NFE budget (model evaluations)")
    ax.set_ylabel("E[best verifier score]")
    ax.set_title("Same eval budget, three allocations:\n"
                 "fast solver x search dominates", fontsize=11)
    ax.legend(frameon=False, fontsize=9, loc="lower right")
    fig.tight_layout()
    fig.savefig(png_path)


if __name__ == "__main__":
    main()
