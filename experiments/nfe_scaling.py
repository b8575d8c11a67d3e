"""The paper's headline claim, demonstrated end-to-end on the chip:
verifier score scales with *search* NFE long after scaling *denoising steps*
saturates (arXiv 2501.09732 Fig. 1 — the reference repo never ran this;
its search library is un-wired, SURVEY §1 L3).

One script, fully reproducible:
  1. generate a class-structured procedural dataset (shapes; no CIFAR-10
     exists on this machine and the environment has no egress),
  2. train a classifier verifier on it (held-out accuracy reported),
  3. train a real DDPM UNet on the TPU,
  4. evaluate two scaling axes from the same checkpoint:
       a. denoising-step scaling: DDIM step sweep (NFE = model evals),
       b. search scaling: random (best-of-N), zero-order, and path search
          at increasing NFE budgets,
  5. independent quality check: FID-proxy of winners vs held-out real
     features (guards against verifier hacking, paper §5),
  6. write docs/results/nfe_scaling.jsonl + nfe_scaling.png.

Usage:
  python experiments/nfe_scaling.py                # full run (~20-30 min)
  python experiments/nfe_scaling.py --quick        # CPU-sized smoke
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

from itsd_tpu.core import ddim_sample, linear_schedule, sample
from itsd_tpu.data import BatchIterator, shapes_dataset
from itsd_tpu.metrics import frechet_distance, gaussian_stats
from itsd_tpu.models import UNet, uncond_unet_config
from itsd_tpu.models.classifier import ClassifierConfig, train_classifier
from itsd_tpu.search import path_search, random_search, zero_order_search
from itsd_tpu.train import (OptimizerConfig, create_train_state,
                            make_optimizer, make_train_step)

# validated categorical palette (dataviz reference instance, slots 1-4)
C_RANDOM, C_ZERO, C_PATH, C_STEPS = ("#2a78d6", "#eb6834", "#1baf7a",
                                     "#eda100")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="tiny sizes for a CPU smoke run")
    p.add_argument("--train-steps", type=int, default=3000)
    p.add_argument("--T", type=int, default=200)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--img", type=int, default=32)
    p.add_argument("--n-data", type=int, default=8192)
    p.add_argument("--cand-batch", type=int, default=4,
                   help="images per candidate (one candidate = one batch)")
    p.add_argument("--outdir", default="docs/results")
    return p.parse_args()


def pixel_features(images_unit):
    """Cheap independent feature map for the FID-proxy check (images in
    [0,1] -> pooled 8x8x3)."""
    from itsd_tpu.search.verifiers import adaptive_avg_pool
    return np.asarray(adaptive_avg_pool(jnp.asarray(images_unit), 8)
                      .reshape(images_unit.shape[0], -1))


def main():
    a = parse_args()
    if a.quick:
        a.train_steps, a.T, a.batch = 60, 16, 32
        a.n_data, a.img = 512, 16
    os.makedirs(a.outdir, exist_ok=True)
    jsonl = open(os.path.join(a.outdir, "nfe_scaling.jsonl"), "w")

    def emit(rec):
        rec = {k: (float(v) if isinstance(v, (np.floating, jnp.ndarray))
                   else v) for k, v in rec.items()}
        jsonl.write(json.dumps(rec) + "\n")
        jsonl.flush()
        print(json.dumps(rec))

    # ---------------------------------------------------------- 1. data
    t0 = time.time()
    images, labels = shapes_dataset(n=a.n_data, img_size=a.img, seed=0)
    n_hold = max(64, a.n_data // 8)
    hold_unit = (images[:n_hold] + 1.0) / 2.0
    tr_images, tr_labels = images[n_hold:], labels[n_hold:]
    emit({"phase": "data", "n": int(a.n_data), "held_out": int(n_hold),
          "seconds": round(time.time() - t0, 1)})

    # ----------------------------------------------- 2. classifier verifier
    t0 = time.time()
    n_cls = min(len(tr_images), 4096)
    logit_fn, _, acc = train_classifier(
        tr_images[:n_cls], tr_labels[:n_cls],
        ClassifierConfig(ch=16 if a.quick else 32),
        epochs=2 if a.quick else 8)
    # held-out accuracy (train_classifier reports train-subset accuracy)
    hold_pred = np.asarray(jnp.argmax(logit_fn(jnp.asarray(hold_unit)), -1))
    hold_acc = float((hold_pred == labels[:n_hold]).mean())
    emit({"phase": "classifier", "train_acc": acc, "holdout_acc": hold_acc,
          "seconds": round(time.time() - t0, 1)})

    def verifier(imgs):  # [B,H,W,C] in [-1,1] -> scalar (mean confidence)
        unit = (imgs + 1.0) / 2.0
        logp = jax.nn.log_softmax(logit_fn(unit), axis=-1)
        return jnp.max(logp, axis=-1).mean()

    # ------------------------------------------------------- 3. train DDPM
    # quick ch must keep every concat channel count divisible by the
    # GroupNorm group count (32), so >= 32
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
    t0 = time.time()
    losses, n = [], 0
    while n < a.train_steps:
        for batch in it:
            key, sk = jax.random.split(key)
            state, m = step(state, {"image": jnp.asarray(batch["image"])},
                            sk)
            losses.append(m["loss"])  # device scalar, no per-step sync
            n += 1
            if n >= a.train_steps:
                break
    losses = [float(x) for x in jax.device_get(losses)]
    emit({"phase": "train", "steps": n,
          "loss_first20": round(float(np.mean(losses[:20])), 4),
          "loss_last20": round(float(np.mean(losses[-20:])), 4),
          "seconds": round(time.time() - t0, 1)})
    eparams = state.ema_params if state.ema_params is not None else \
        state.params
    eps_fn = lambda x, t: model.apply(eparams, x, t)
    denoise = lambda noise, k: sample(sched, eps_fn, noise, k)
    B = a.cand_batch
    shape = (B, a.img, a.img, 3)
    mu_r, sig_r = gaussian_stats(pixel_features(hold_unit))

    def fid_proxy(imgs):
        mu_f, sig_f = gaussian_stats(pixel_features(
            (np.asarray(imgs) + 1.0) / 2.0))
        return float(frechet_distance(mu_r, sig_r, mu_f, sig_f))

    # --------------------------- 4a. denoising-step scaling (DDIM sweep)
    step_grid = ([2, 4, 8, 16] if a.quick
                 else [10, 25, 50, 100, 150, 200])
    x_T = jax.random.normal(jax.random.PRNGKey(10), shape)
    for ns in step_grid:
        ns = min(ns, a.T)
        run = jax.jit(lambda noise, k, _ns=ns: ddim_sample(
            sched, eps_fn, noise, k, num_steps=_ns))
        t0 = time.time()
        imgs = run(x_T, jax.random.PRNGKey(11))
        s = float(verifier(imgs))
        emit({"phase": "step_scaling", "ddim_steps": ns, "nfe_evals": ns,
              "score": round(s, 4), "fid_proxy": round(fid_proxy(imgs), 3),
              "seconds": round(time.time() - t0, 1)})

    # ----------------------- 4b. search scaling: random best-of-N (one run)
    N = 8 if a.quick else 64
    t0 = time.time()

    @jax.jit
    def run_random(k):
        r = random_search(k, shape, denoise, verifier, n_candidates=N,
                          return_images=True)
        return r.history["scores"], r.best_images
    scores, best_imgs = run_random(jax.random.PRNGKey(20))
    scores = np.asarray(scores)
    wall = time.time() - t0
    # visual artifacts: unguided samples vs the best-of-N winner batch
    from itsd_tpu.utils.images import save_image_grid
    plain = jax.jit(lambda k: sample(
        sched, eps_fn, jax.random.normal(k, (16, a.img, a.img, 3)),
        jax.random.fold_in(k, 1)))(jax.random.PRNGKey(21))
    save_image_grid(np.asarray(plain),
                    os.path.join(a.outdir, "nfe_scaling_samples.png"), nrow=4)
    save_image_grid(np.asarray(best_imgs),
                    os.path.join(a.outdir, "nfe_scaling_best_of_n.png"),
                    nrow=2)
    # bootstrap E[max of a random N-subset] from the one candidate pool
    rng = np.random.default_rng(0)
    for nn in [1, 2, 4, 8, 16, 32, 64]:
        if nn > N:
            break
        boots = [scores[rng.choice(N, nn, replace=False)].max()
                 for _ in range(200)]
        emit({"phase": "search_random", "n_candidates": nn,
              "nfe_full_denoises": nn, "nfe_evals": nn * a.T,
              "score_mean_of_max": round(float(np.mean(boots)), 4),
              "score_std": round(float(np.std(boots)), 4)})
    emit({"phase": "search_random_pool", "N": N,
          "pool_best": round(float(scores.max()), 4),
          "pool_mean": round(float(scores.mean()), 4),
          "fid_proxy_best": round(fid_proxy(best_imgs), 3),
          "wall_seconds": round(wall, 1)})

    # -------------------------------------- 4b. zero-order (one scan run)
    n_iter = 2 if a.quick else 16
    t0 = time.time()
    init = jax.random.normal(jax.random.PRNGKey(30), shape)

    @jax.jit
    def run_zo(k, init):
        r = zero_order_search(k, init, denoise, verifier, n_neighbors=4,
                              n_iterations=n_iter, neighbor_mode="shell",
                              lambda_radius=0.9)
        return r.history["scores"]
    zo_scores = np.asarray(run_zo(jax.random.PRNGKey(31), init))
    wall = time.time() - t0
    cum = np.maximum.accumulate(zo_scores.max(axis=1))
    for i in range(n_iter):
        emit({"phase": "search_zero_order", "iteration": i + 1,
              "nfe_full_denoises": (i + 1) * 4,
              "nfe_evals": (i + 1) * 4 * a.T,
              "score_best_so_far": round(float(cum[i]), 4)})
    emit({"phase": "search_zero_order_done", "wall_seconds": round(wall, 1)})

    # ------------------------------------------------- 4b. path search
    inj = [a.T // 2] if a.quick else [a.T // 2, a.T // 4]
    for n_paths in ([2, 4] if a.quick else [4, 16, 64]):
        t0 = time.time()

        @jax.jit
        def run_path(k, _np_=n_paths):
            r = path_search(k, sched, eps_fn, verifier, shape,
                            n_paths=_np_, n_active=max(1, _np_ // 4),
                            injection_steps=tuple(inj),
                            delta_f=max(2, a.T // 10))
            return r.best_score, r.best_noise, r.history["final_scores"]
        best, best_x, finals = run_path(jax.random.PRNGKey(40 + n_paths))
        # NFE: n_paths full chains + re-denoised segments (see path_search)
        nfes = n_paths * (1 + len(inj) * (0.5 + max(2, a.T // 10) / a.T))
        emit({"phase": "search_path", "n_paths": n_paths,
              "nfe_full_denoises": round(nfes, 1),
              "nfe_evals": int(round(nfes * a.T)),
              "score_best": round(float(best), 4),
              "score_final_mean": round(float(np.asarray(finals).mean()), 4),
              "fid_proxy_best": round(fid_proxy(best_x), 3),
              "wall_seconds": round(time.time() - t0, 1)})

    jsonl.close()
    make_plot(os.path.join(a.outdir, "nfe_scaling.jsonl"),
              os.path.join(a.outdir, "nfe_scaling.png"))
    print("wrote", os.path.join(a.outdir, "nfe_scaling.png"))


def make_plot(jsonl_path, png_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    recs = [json.loads(l) for l in open(jsonl_path)]
    by = lambda ph: [r for r in recs if r["phase"] == ph]

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10.5, 4.2), dpi=150)
    for ax in (ax1, ax2):
        ax.grid(True, which="both", color="#e6e3db", lw=0.6, zorder=0)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        ax.set_axisbelow(True)

    # panel A: scaling denoising steps saturates
    ss = by("step_scaling")
    ax1.plot([r["nfe_evals"] for r in ss], [r["score"] for r in ss],
             color=C_STEPS, lw=2, marker="o", ms=5, zorder=3)
    ax1.set_xscale("log")
    ax1.set_xlabel("NFE (model evaluations, DDIM steps)")
    ax1.set_ylabel("verifier score (mean max log-prob)")
    ax1.set_title("Scaling denoising steps saturates", fontsize=11)

    # panel B: scaling search keeps climbing
    rnd = by("search_random")
    zo = by("search_zero_order")
    pth = by("search_path")
    ax2.plot([r["nfe_evals"] for r in rnd],
             [r["score_mean_of_max"] for r in rnd],
             color=C_RANDOM, lw=2, marker="o", ms=5, label="random (best-of-N)",
             zorder=3)
    ax2.plot([r["nfe_evals"] for r in zo],
             [r["score_best_so_far"] for r in zo],
             color=C_ZERO, lw=2, marker="s", ms=5, label="zero-order",
             zorder=3)
    ax2.plot([r["nfe_evals"] for r in pth],
             [r["score_best"] for r in pth],
             color=C_PATH, lw=2, marker="^", ms=6, label="path search",
             zorder=3)
    ax2.set_xscale("log")
    ax2.set_xlabel("NFE (model evaluations, search)")
    ax2.set_ylabel("verifier score (mean max log-prob)")
    ax2.set_title("Scaling search keeps improving", fontsize=11)
    ax2.legend(frameon=False, fontsize=9)

    # shared y-scale: the contrast (steps stuck, search climbing) must be
    # visible without reading the axes
    all_scores = ([r["score"] for r in ss]
                  + [r["score_mean_of_max"] for r in rnd]
                  + [r["score_best_so_far"] for r in zo]
                  + [r["score_best"] for r in pth])
    lo, hi = min(all_scores), max(all_scores)
    pad = 0.06 * (hi - lo + 1e-9)
    for ax in (ax1, ax2):
        ax.set_ylim(lo - pad, hi + pad)

    fig.suptitle("Inference-time scaling beyond denoising steps "
                 "(trained on-chip, classifier verifier)", fontsize=12)
    fig.tight_layout()
    fig.savefig(png_path)


if __name__ == "__main__":
    main()
