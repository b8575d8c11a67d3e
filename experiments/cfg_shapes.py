"""Classifier-free guidance demonstrated end-to-end on-chip, quantitatively.

The reference's central demo is CFG on CIFAR-10 (`MainCondition.py`) —
"verified" only by eyeballing sample grids. This experiment trains the
conditional UNet on the labeled shapes dataset on one TPU chip, then
measures what guidance actually does:

  * class-control accuracy: an independently-trained classifier must assign
    guided samples to their REQUESTED class (the quantitative version of
    "the grid rows look like the right classes"),
  * FID-proxy vs held-out real features: the fidelity/diversity price of
    large w (the classic CFG trade-off), measured, not asserted.

Sweeps w in {0, 0.5, 1.8, 3.0} (w=1.8 is the reference's setting) from the
same checkpoint; dual-batched CFG forward; EMA weights. Writes
docs/results/cfg_shapes.jsonl + cfg_shapes_w*.png grids (rows = classes).

Usage: python experiments/cfg_shapes.py [--quick]
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

from itsd_tpu.core import linear_schedule, make_cfg_eps_fn, sample
from itsd_tpu.data import BatchIterator, shapes_dataset
from itsd_tpu.metrics import frechet_distance, gaussian_stats
from itsd_tpu.models import UNet, cond_unet_config
from itsd_tpu.models.classifier import ClassifierConfig, train_classifier
from itsd_tpu.search.verifiers import adaptive_avg_pool
from itsd_tpu.train import (OptimizerConfig, create_train_state,
                            make_optimizer, make_train_step)
from itsd_tpu.utils.images import save_image_grid


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--train-steps", type=int, default=6000)
    p.add_argument("--T", type=int, default=200)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--img", type=int, default=32)
    p.add_argument("--n-data", type=int, default=8192)
    p.add_argument("--per-class", type=int, default=10)
    p.add_argument("--outdir", default="docs/results")
    return p.parse_args()


def main():
    a = parse_args()
    if a.quick:
        a.train_steps, a.T, a.batch = 60, 16, 32
        a.n_data, a.img, a.per_class = 512, 16, 2
    os.makedirs(a.outdir, exist_ok=True)
    jsonl = open(os.path.join(a.outdir, "cfg_shapes.jsonl"), "w")

    def emit(rec):
        rec = {k: (float(v) if isinstance(v, (np.floating, jnp.ndarray))
                   else v) for k, v in rec.items()}
        jsonl.write(json.dumps(rec) + "\n")
        jsonl.flush()
        print(json.dumps(rec))

    # ------------------------------------------- data + measurement tools
    images, labels = shapes_dataset(n=a.n_data, img_size=a.img, seed=0)
    n_hold = max(64, a.n_data // 8)
    hold_unit = (images[:n_hold] + 1.0) / 2.0
    tr_images, tr_labels = images[n_hold:], labels[n_hold:]
    n_cls = min(len(tr_images), 4096)
    logit_fn, _, _ = train_classifier(
        tr_images[:n_cls], tr_labels[:n_cls],
        ClassifierConfig(ch=16 if a.quick else 32),
        epochs=2 if a.quick else 8)
    hold_pred = np.asarray(jnp.argmax(logit_fn(jnp.asarray(hold_unit)), -1))
    emit({"phase": "classifier",
          "holdout_acc": float((hold_pred == labels[:n_hold]).mean())})
    mu_r, sig_r = gaussian_stats(np.asarray(
        adaptive_avg_pool(jnp.asarray(hold_unit), 8).reshape(n_hold, -1)))

    # ------------------------------------------ train the conditional UNet
    ccfg = cond_unet_config(
        num_labels=10, ch=32 if a.quick else 64,
        ch_mult=(1, 2) if a.quick else (1, 2, 2),
        num_res_blocks=1 if a.quick else 2, dropout=0.1, T=a.T,
        dtype="bfloat16")
    model = UNet(ccfg)
    sched = linear_schedule(1e-4, 0.02, a.T)
    it = BatchIterator(tr_images, tr_labels, a.batch, seed=0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, a.img, a.img, 3)),
                        jnp.zeros((2,), jnp.int32),
                        jnp.zeros((2,), jnp.int32))
    steps_per_epoch = max(len(it), 1)
    tx = make_optimizer(OptimizerConfig(
        lr=2e-4, epochs=max(1, a.train_steps // steps_per_epoch + 1),
        steps_per_epoch=steps_per_epoch))
    state = create_train_state(params, tx)
    step = make_train_step(lambda p, *ar, **kw: model.apply(p, *ar, **kw),
                           sched, tx, conditional=True)
    key = jax.random.PRNGKey(1)
    t0, n, losses = time.time(), 0, []
    while n < a.train_steps:
        for batch in it:
            key, sk = jax.random.split(key)
            state, m = step(state, {"image": jnp.asarray(batch["image"]),
                                    "label": jnp.asarray(batch["label"])},
                            sk)
            losses.append(m["loss"])
            n += 1
            if n >= a.train_steps:
                break
    losses = [float(x) for x in jax.device_get(losses)]
    emit({"phase": "train", "steps": n, "conditional": True,
          "loss_last20": round(float(np.mean(losses[-20:])), 4),
          "seconds": round(time.time() - t0, 1)})
    eparams = state.ema_params if state.ema_params is not None else \
        state.params

    # --------------------------------------------------- guidance sweep
    # request per_class samples of every class: labels row-major by class
    req = np.repeat(np.arange(10), a.per_class)
    lab_plus1 = jnp.asarray(req + 1, jnp.int32)
    B = len(req)
    model_eps = lambda xx, tt, ll: model.apply(eparams, xx, tt, ll)

    for w in ([0.0, 1.8] if a.quick else [0.0, 0.5, 1.8, 3.0]):
        eps_fn = make_cfg_eps_fn(model_eps, lab_plus1, w)
        run = jax.jit(lambda noise, k, _e=eps_fn: sample(sched, _e, noise, k))
        t0 = time.time()
        noise = jax.random.normal(jax.random.PRNGKey(30),
                                  (B, a.img, a.img, 3))
        imgs = run(noise, jax.random.PRNGKey(31))
        jax.block_until_ready(imgs)
        unit = (np.asarray(imgs) + 1.0) / 2.0
        pred = np.asarray(jnp.argmax(logit_fn(jnp.asarray(unit)), -1))
        acc = float((pred == req).mean())
        mu_f, sig_f = gaussian_stats(np.asarray(
            adaptive_avg_pool(jnp.asarray(unit), 8).reshape(B, -1)))
        fid = float(frechet_distance(mu_r, sig_r, mu_f, sig_f))
        emit({"phase": "guidance", "w": w, "n": B,
              "class_control_acc": round(acc, 4),
              "fid_proxy": round(fid, 3),
              "seconds": round(time.time() - t0, 1)})
        save_image_grid(np.asarray(imgs),
                        os.path.join(a.outdir,
                                     f"cfg_shapes_w{str(w).replace('.','_')}"
                                     ".png"),
                        nrow=a.per_class)
    jsonl.close()


if __name__ == "__main__":
    main()
