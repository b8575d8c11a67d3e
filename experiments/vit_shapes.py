"""ViT denoiser (C9) trained and measured end-to-end on-chip.

The reference ships a ViT backbone (`/root/reference/Diffusion/Model.py:357-456`)
that no training loop ever imports (`Diffusion/Train.py:21` imports UNet
only). This experiment runs ours for real, with two goals:

1. **Coverage** — train the ViT on the shapes dataset under the exact
   protocol of the committed UNet artifact (`artifacts/shapes32_uncond`:
   shapes32, T=1000, 3000 steps, batch 256, EMA), sample it, score it with
   the same committed classifier verifier, and drive best-of-N search over
   it through the product path (`model.backbone=vit` via cli.runner).
2. **Perf** — docs/PERF.md defends a ~45% train-MFU structural ceiling for
   the UNet at 32x32: the filter-gradient convs of small-channel stages run
   at 27% of MXU peak by dimension mapping. The ViT's compute is plain
   matmuls whose backprop has no such defect — this measures whether the
   transformer backbone actually clears the conv ceiling on v5e, from the
   *real* training run (MFU = XLA cost-model FLOPs of the jitted
   500-step chunk / measured chunk wall time).

Usage: python experiments/vit_shapes.py [--steps 3000] [--skip-search]
Writes: artifacts/shapes32_vit(.json), docs/results/vit_shapes.json,
        docs/results/artifact_shapes32_vit_sampled.png
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

ARTIFACTS = os.path.join(REPO, "artifacts")
RESULTS = os.path.join(REPO, "docs", "results")

# DiT-style operating point: patch 2 at 32x32 = 256 tokens (the same token
# count as the UNet's attn@16x16 stage), width/depth sized so params are
# comparable to the UNet artifact (~15.6M vs the UNet's ~10M).
VIT = dict(img=32, patch_size=2, embed_dim=384, depth=8, num_heads=6,
           mlp_ratio=4.0, dropout=0.1)
TRAIN_T = 1000
PEAK_TFLOPS = 197e12  # v5e bf16


def note(m):
    print(f"[vit] {m}", file=sys.stderr, flush=True)


def build_vit(dtype="bfloat16"):
    from itsd_tpu.models import ViT, ViTConfig
    cfg = ViTConfig(img_size=VIT["img"], patch_size=VIT["patch_size"],
                    embed_dim=VIT["embed_dim"], depth=VIT["depth"],
                    num_heads=VIT["num_heads"], mlp_ratio=VIT["mlp_ratio"],
                    dropout=VIT["dropout"], attention_impl="auto",
                    dtype=dtype)
    return ViT(cfg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-search", action="store_true")
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from itsd_tpu.core import linear_schedule, sample as core_sample
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.models.classifier import load_classifier
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer, make_train_step)
    from itsd_tpu.train.checkpoint import save_params
    from itsd_tpu.utils import chunked_device_put, save_image_grid

    rec = {"model": dict(VIT), "train_T": TRAIN_T, "steps": args.steps,
           "batch": args.batch, "dataset": "shapes32",
           "protocol": "identical to artifacts/shapes32_uncond "
                       "(same data/T/steps/batch/EMA)"}

    # ------------------------------------------------------------ 1. train
    model = build_vit()
    images, labels = shapes_dataset(n=8192, img_size=VIT["img"],
                                    num_labels=10, seed=args.seed)
    sched = linear_schedule(1e-4, 0.02, TRAIN_T)
    x = jnp.zeros((2, VIT["img"], VIT["img"], 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(args.seed), x,
                        jnp.zeros((2,), jnp.int32))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    rec["n_params"] = n_params
    note(f"{n_params/1e6:.1f}M params, {len(images)} images, "
         f"{args.steps} steps @ batch {args.batch}")

    tx = make_optimizer(OptimizerConfig(
        lr=2e-4, epochs=max(1, args.steps * args.batch // len(images)),
        steps_per_epoch=len(images) // args.batch, ema_decay=0.999))
    state = create_train_state(params, tx, ema=True)
    step_fn = make_train_step(
        lambda p, *aa, **kw: model.apply(p, *aa, **kw), sched, tx,
        ema_decay=0.999, donate=False)

    xs = chunked_device_put(images)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fit_chunk(state, xs, idx_chunk, keys_chunk):
        def body(st, inp):
            bidx, skey = inp
            st, metrics = step_fn(st, {"image": jnp.take(xs, bidx, axis=0)},
                                  skey)
            return st, metrics["loss"]
        return lax.scan(body, state, (idx_chunk, keys_chunk))

    # watchdog-safe launches: a 500-step ViT chunk trips the ~1 min
    # TPU-worker device-time watchdog (observed); 100 steps is ~6-12 s
    chunk = 100
    key = jax.random.PRNGKey(args.seed + 1)

    # the last 1024 images are a true holdout for the quality section —
    # training batches draw only from the first len-1024
    n_train = len(images) - 1024

    def chunk_inputs(done, n_now):
        idx = jnp.asarray(
            np.random.default_rng(args.seed * 7919 + done).integers(
                0, n_train, size=(n_now, args.batch)), jnp.int32)
        return idx, jax.random.split(jax.random.fold_in(key, done), n_now)

    # cost-model FLOPs of ONE jitted train step. NOTE: cost_analysis() on a
    # lax.scan program reports the loop body once (not x trip count), so
    # the chunk program can't be used directly — lower a single step with
    # the same shapes instead and multiply by the chunk length.
    step_flops = None
    try:
        one = jax.jit(step_fn)
        ca = one.lower(state, {"image": jnp.zeros(
            (args.batch, VIT["img"], VIT["img"], 3), jnp.float32)},
            jax.random.PRNGKey(0)).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        step_flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        note(f"cost_analysis unavailable: {e}")

    t0 = time.time()
    loss0 = lossN = None
    done = 0
    chunk_walls = []
    while done < args.steps:
        n_now = min(chunk, args.steps - done)
        tc = time.time()
        state, losses = fit_chunk(state, xs, *chunk_inputs(done, n_now))
        jax.block_until_ready(losses)
        wall = time.time() - tc
        done += n_now
        if loss0 is None:
            loss0 = float(losses[0])
            note(f"step 0 loss {loss0:.4f} (first chunk incl compile "
                 f"{wall:.0f}s)")
        else:
            if n_now == chunk:
                chunk_walls.append(wall)
        lossN = float(losses[-1])
        note(f"step {done} loss {lossN:.4f} "
             f"({done/(time.time()-t0):.1f} steps/s)")
    train_wall = time.time() - t0
    rec["loss_first"] = loss0
    rec["loss_final"] = lossN
    rec["train_wall_s"] = round(train_wall, 1)
    if chunk_walls and step_flops:
        best = min(chunk_walls)
        rec["train_step"] = {
            "ms_per_step": round(best / chunk * 1e3, 2),
            "images_per_sec": round(args.batch * chunk / best, 1),
            "mfu_vs_197tflops": round(
                step_flops * chunk / best / PEAK_TFLOPS, 3),
            "flops_per_step": step_flops,
            "measured_on": f"best steady {chunk}-step jitted chunk of the "
                           "real training run; FLOPs from a single-step "
                           "lowering (scan cost_analysis counts the body "
                           "once)",
        }
        note(f"train step: {rec['train_step']['ms_per_step']} ms, "
             f"MFU {rec['train_step']['mfu_vs_197tflops']}")

    # save the EMA artifact (bf16, product checkpoint path)
    out_path = os.path.join(ARTIFACTS, "shapes32_vit")
    ema_small = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if getattr(a, "dtype", None) == jnp.float32 else a,
        state.ema_params)
    save_params(out_path, jax.device_get(ema_small))
    with open(os.path.join(ARTIFACTS, "shapes32_vit.json"), "w") as f:
        json.dump({"arch": dict(VIT), "backbone": "vit",
                   "train_T": TRAIN_T, "steps": args.steps,
                   "batch": args.batch, "dataset": "shapes32",
                   "loss_first": loss0, "loss_final": lossN, "ema": True,
                   "dtype_saved": "bfloat16",
                   "wall_s": round(train_wall, 1)}, f, indent=1)
    note(f"saved -> {out_path}")

    # -------------------------------------------------- 2. sampler MFU
    ema_f32 = jax.tree.map(lambda p: jnp.asarray(p, jnp.float32),
                           state.ema_params)
    eps_fn = lambda xx, tt: model.apply(ema_f32, xx, tt)
    bs = 8
    samp = jax.jit(lambda noise, k: core_sample(sched, eps_fn, noise, k))
    noise8 = jax.random.normal(jax.random.PRNGKey(5),
                               (bs, VIT["img"], VIT["img"], 3))
    samp_flops = None
    try:
        ca = samp.lower(noise8, jax.random.PRNGKey(6)).compile() \
            .cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        samp_flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    jax.block_until_ready(samp(noise8, jax.random.PRNGKey(6)))  # compile
    walls = []
    for i in range(3):
        ts = time.time()
        jax.block_until_ready(samp(noise8, jax.random.PRNGKey(7 + i)))
        walls.append(time.time() - ts)
    best = min(walls)
    # samp is a lax.scan over T steps: cost_analysis reports the body once,
    # so samp_flops ~= FLOPs of ONE denoise eval (+ renoise tail)
    rec["sampler"] = {
        "T": TRAIN_T, "batch": bs, "seconds_per_batch": round(best, 3),
        "images_per_sec": round(bs / best, 2),
        "mfu_vs_197tflops": (round(
            samp_flops * TRAIN_T / best / PEAK_TFLOPS, 3)
            if samp_flops else None),
        "flops_per_eval": samp_flops,
    }
    note(f"sampler T={TRAIN_T} batch {bs}: {best:.3f}s, "
         f"MFU {rec['sampler']['mfu_vs_197tflops']}")

    # ------------------------- 3. quality head-to-head vs the UNet artifact
    from itsd_tpu.search.verifiers import make_fid_proxy, to_unit_range

    logit_fn, _, _ = load_classifier(
        os.path.join(ARTIFACTS, "classifier_shapes32"))
    # images[-1024:] are excluded from training above — a true holdout
    fid_proxy = make_fid_proxy(jnp.asarray(images[-1024:]))

    def quality(imgs):
        logp = jax.nn.log_softmax(
            logit_fn(to_unit_range(jnp.asarray(imgs))), axis=-1)
        return {"classifier_max_logprob": float(
                    jnp.max(logp, axis=-1).mean()),
                "fid_proxy": round(fid_proxy(imgs), 3)}

    noise64 = jax.random.normal(jax.random.PRNGKey(20),
                                (64, VIT["img"], VIT["img"], 3))
    samp64 = jax.jit(lambda noise, k: core_sample(sched, eps_fn, noise, k))
    vit_imgs = samp64(noise64, jax.random.PRNGKey(21))
    rec["quality_vit"] = quality(vit_imgs)
    save_image_grid(np.asarray(vit_imgs[:16]),
                    os.path.join(RESULTS, "artifact_shapes32_vit_sampled.png"),
                    nrow=4)

    # same noise, same sampler, the committed UNet artifact
    import bench as _bench
    unet_params = _bench.load_artifact_params("shapes32_uncond")
    if unet_params is not None:
        import experiments.train_artifacts as ta
        unet, _ = ta.build_unet("shapes32_uncond")
        ueps = lambda xx, tt: unet.apply(unet_params, xx, tt)
        usamp = jax.jit(lambda noise, k: core_sample(sched, ueps, noise, k))
        unet_imgs = usamp(noise64, jax.random.PRNGKey(21))
        rec["quality_unet_same_noise"] = quality(unet_imgs)
    rec["quality_real_holdout_selfcheck"] = quality(images[-1024:][:64])
    note(f"quality vit={rec['quality_vit']} "
         f"unet={rec.get('quality_unet_same_noise')}")

    # ------------------- 4. best-of-16 search through the product path
    if not args.skip_search:
        from itsd_tpu.cli.runner import run_search
        from itsd_tpu.utils.config import load_config
        cfg = load_config(None, [
            "data.dataset=synthetic", f"data.img_size={VIT['img']}",
            "model.backbone=vit",
            f"model.patch_size={VIT['patch_size']}",
            f"model.embed_dim={VIT['embed_dim']}",
            f"model.depth={VIT['depth']}",
            f"model.num_heads={VIT['num_heads']}",
            f"model.mlp_ratio={VIT['mlp_ratio']}",
            f"model.dropout={VIT['dropout']}",
            "model.dtype=bfloat16",
            f"diffusion.T={TRAIN_T}",
            f"save_weight_dir={ARTIFACTS}",
            "test_load_weight=shapes32_vit",
            "search.algorithm=random", "search.n_candidates=16",
            "search.verifier=classifier",
            f"search.classifier_ckpt="
            f"{os.path.join(ARTIFACTS, 'classifier_shapes32')}",
            "search.target_label=3",
            "train.eval_batch_size=4",
            f"sampled_dir={os.path.join(REPO, 'sampled', 'vit_search')}",
            "nrow=2",
        ])
        ts = time.time()
        out = run_search(cfg)
        scores = np.asarray(out["result"].history["scores"], np.float64)
        rec["search"] = {
            "workload": "best-of-16 random search, T=1000 ancestral, "
                        "classifier verifier (target class 3), through "
                        "cli.runner.run_search with model.backbone=vit",
            "best_score": out["best_score"],
            "median_score": float(np.median(scores)),
            "wall_s_incl_compile": round(time.time() - ts, 1),
        }
        note(f"search best {out['best_score']:.4f} vs median "
             f"{rec['search']['median_score']:.4f}")

    out_json = os.path.join(RESULTS, "vit_shapes.json")
    with open(out_json, "w") as f:
        json.dump(rec, f, indent=1)
    note(f"-> {out_json}")


if __name__ == "__main__":
    main()
