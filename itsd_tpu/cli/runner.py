"""End-to-end pipelines: train / eval / metric-tracked inference / search /
T-extension fine-tune.

This is the orchestration layer over the pure core — the TPU rebuild of the
reference's training and eval loops:
  train()                  — C23 `Diffusion/Train.py:404-805` +
                             C28 `DiffusionFreeGuidence/TrainCondition.py:21-115`
  evaluate()               — C27 `Train.py:808-843` + C29 `TrainCondition.py:118-151`
  sample_with_metrics()    — C24 `Train.py:25-166` / C31 `abstract_metrics…py`
  run_search()             — wires search+verifiers to a CLI (the reference
                             ships the search library un-wired; SURVEY §1 L3)
  finetune_extended_T()    — C30 `fine_tune_extended_T.py`
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import (ddim_sample, dpm_solver_sample, linear_schedule,
                    make_cfg_eps_fn, parallel_picard_sample, sample,
                    sample_with_snapshots)
from ..data import (BatchIterator, load_cifar10, load_image_folder,
                    shapes_dataset, synthetic_dataset)
from ..models import UNet, ViT, ViTConfig, cond_unet_config, \
    uncond_unet_config
from ..parallel import make_mesh, param_sharding, shard_batch
from ..train import (OptimizerConfig, create_train_state, make_optimizer,
                     make_train_step)
from ..train.checkpoint import (restore_checkpoint, restore_params,
                                save_checkpoint, save_params)
from ..train.surgery import (detect_checkpoint_T, extend_time_embedding,
                             freeze_except_time_embedding)
from ..utils import Config, MetricsLogger, save_image_grid
from ..utils.plotting import plot_loss_curve, plot_metrics_curves


# ---------------------------------------------------------------------------
# Builders


def build_model(cfg: Config):
    m = cfg.model
    if m.backbone == "vit":
        vcfg = ViTConfig(img_size=cfg.data.img_size, patch_size=m.patch_size,
                         embed_dim=m.embed_dim, depth=m.depth,
                         num_heads=m.num_heads, mlp_ratio=m.mlp_ratio,
                         dropout=m.dropout, attention_impl=m.attention_impl,
                         dtype=m.dtype, remat=m.remat)
        return ViT(vcfg), False
    conditional = m.num_labels is not None
    if conditional:
        ucfg = cond_unet_config(
            num_labels=m.num_labels, ch=m.channel,
            ch_mult=tuple(m.channel_mult), num_res_blocks=m.num_res_blocks,
            dropout=m.dropout, T=cfg.diffusion.T, dtype=m.dtype,
            attention_impl=m.attention_impl, remat=m.remat)
        if m.time_embed == "functional":
            import dataclasses as _dc
            ucfg = _dc.replace(ucfg, time_embed="functional")
    else:
        ucfg = uncond_unet_config(
            ch=m.channel, ch_mult=tuple(m.channel_mult),
            attn=tuple(m.attn), num_res_blocks=m.num_res_blocks,
            dropout=m.dropout, T=cfg.diffusion.T, time_embed=m.time_embed,
            dtype=m.dtype, attention_impl=m.attention_impl, remat=m.remat)
    return UNet(ucfg), conditional


def build_schedule(cfg: Config, inference: bool = False):
    d = cfg.diffusion
    T = d.inference_T if (inference and d.inference_T) else d.T
    return linear_schedule(d.beta_1, d.beta_T, T)


_dataset_cache: dict = {}


def load_dataset(cfg: Config):
    d = cfg.data
    # single-entry memo: within one run several stages need the dataset
    # (ensemble-verifier real stats, then the guard's proxy stats) — the
    # second request must not pay a full reload. One entry only, so a
    # different dataset config replaces rather than accumulates.
    memo_key = (d.dataset, d.root, d.img_size, d.use_full_dataset,
                d.train_subset_ratio, d.seed, cfg.model.num_labels,
                cfg.train.batch_size)
    if memo_key in _dataset_cache:
        return _dataset_cache[memo_key]
    out = _load_dataset_uncached(cfg)
    _dataset_cache.clear()
    _dataset_cache[memo_key] = out
    return out


def _load_dataset_uncached(cfg: Config):
    d = cfg.data
    ratio = None if d.use_full_dataset else d.train_subset_ratio
    if d.dataset == "cifar10":
        return load_cifar10(d.root, train=True, subset_ratio=ratio,
                            seed=d.seed)
    if d.dataset == "imagefolder":
        return load_image_folder(d.root, img_size=d.img_size,
                                 subset_ratio=ratio, seed=d.seed)
    if d.dataset == "synthetic":
        n_labels = cfg.model.num_labels or 10
        return synthetic_dataset(n=max(cfg.train.batch_size * 4, 256),
                                 img_size=d.img_size, num_labels=n_labels,
                                 seed=d.seed)
    if d.dataset == "shapes":
        n_labels = cfg.model.num_labels or 10
        n = max(cfg.train.batch_size * 8, 2048)
        if ratio is not None:
            n = max(1, int(n * ratio))
        return shapes_dataset(n=n, img_size=d.img_size,
                              num_labels=n_labels, seed=d.seed)
    raise ValueError(f"unknown dataset: {d.dataset!r}")


def init_params(cfg: Config, model, conditional: bool):
    x = jnp.zeros((2, cfg.data.img_size, cfg.data.img_size, 3))
    t = jnp.zeros((2,), jnp.int32)
    if conditional:
        return model.init(jax.random.PRNGKey(cfg.seed), x, t,
                          jnp.zeros((2,), jnp.int32))
    return model.init(jax.random.PRNGKey(cfg.seed), x, t)


def load_eval_params(cfg: Config, model, conditional: bool,
                     name: Optional[str] = None):
    """Load weights for inference from `test_load_weight` (or an explicit
    checkpoint `name`, e.g. `diffusion.weak_load_weight` for
    autoguidance): accepts both full training checkpoints (prefer EMA)
    and weights-only checkpoints, then applies cross-T time-embedding
    surgery if needed."""
    name = name or cfg.test_load_weight
    assert name, "needs test_load_weight"
    path = os.path.join(cfg.save_weight_dir, name)
    try:
        restored = restore_checkpoint(path)
        params = restored.ema_params or restored.params
    except (KeyError, TypeError):
        # weights-only checkpoint: restores as a bare params pytree, so the
        # TrainState field access fails; other errors (missing path,
        # corrupt checkpoint) propagate with their real cause
        params = restore_params(
            path, template=init_params(cfg, model, conditional))
    ckpt_T = detect_checkpoint_T(params)
    want_T = cfg.diffusion.inference_T or cfg.diffusion.T
    if ckpt_T is not None and ckpt_T != want_T:
        params = extend_time_embedding(
            params, want_T, strategy=cfg.train.time_embedding_strategy)
    return params


def _cli_segment(cfg: Config, sched, eps_fn):
    """(denoise_seg, cost) for the forking searches from diffusion.sampler:
    path/pruned segments ride DDIM/DPM when configured (picard has no
    segment form; fall back to ancestral). None = ancestral default built
    inside the algorithm."""
    from ..core import make_segment_denoiser
    samp = cfg.diffusion.sampler
    if samp not in ("ddim", "dpm"):
        return None
    return make_segment_denoiser(
        sched, eps_fn, samp,
        num_steps=min(cfg.diffusion.ddim_steps, sched.T),
        clip_denoised=cfg.diffusion.clip_denoised,
        eta=cfg.diffusion.ddim_eta)


def run_sampler(cfg: Config, sched, eps_fn, x_T, key):
    """Dispatch ancestral DDPM vs DDIM vs DPM-Solver++ per config
    (diffusion.sampler; ddim_steps is the step budget for both solvers).
    Non-empty diffusion.restart_intervals wraps the selected family in
    restart sampling (core.sampling.restart_sample)."""
    if cfg.diffusion.restart_intervals:
        from ..core import restart_sample
        samp = cfg.diffusion.sampler
        if samp not in ("ddpm", "ddim", "dpm"):
            raise ValueError(
                "diffusion.restart_intervals requires sampler "
                f"ddpm | ddim | dpm, got {samp!r} (picard has no "
                "segment form)")
        return restart_sample(
            sched, eps_fn, x_T, key,
            restarts=cfg.diffusion.restart_intervals, sampler=samp,
            num_steps=min(cfg.diffusion.ddim_steps, sched.T),
            clip_denoised=cfg.diffusion.clip_denoised,
            eta=cfg.diffusion.ddim_eta)
    if cfg.diffusion.sampler == "ddim":
        return ddim_sample(sched, eps_fn, x_T, key,
                           num_steps=min(cfg.diffusion.ddim_steps, sched.T),
                           eta=cfg.diffusion.ddim_eta)
    if cfg.diffusion.sampler == "dpm":
        return dpm_solver_sample(
            sched, eps_fn, x_T, key,
            num_steps=min(cfg.diffusion.ddim_steps, sched.T))
    if cfg.diffusion.sampler == "picard":
        if len(jax.devices()) == 1:
            import warnings
            warnings.warn(
                "diffusion.sampler=picard on a single chip is MEASURED "
                "SLOWER than sequential DDIM (0.29-0.65x, docs/results/"
                "picard_latency.json): the convs are compute-bound, so "
                "folding the time grid buys nothing without a mesh to "
                "shard it over. Use sampler=ddim/dpm here, picard on "
                ">=2 devices.", stacklevel=2)
        imgs, _ = parallel_picard_sample(
            sched, eps_fn, x_T, key,
            num_steps=min(cfg.diffusion.ddim_steps, sched.T))
        return imgs
    if cfg.diffusion.sampler != "ddpm":
        raise ValueError(
            f"unknown diffusion.sampler {cfg.diffusion.sampler!r}; "
            "expected ddpm | ddim | dpm | picard")
    return sample(sched, eps_fn, x_T, key,
                  clip_denoised=cfg.diffusion.clip_denoised)


def _validated_launch_segments(cfg: Config) -> int:
    """diffusion.launch_segments, validated: segmentation splits the
    ANCESTRAL chain, so it requires sampler=ddpm without restart_intervals
    (the fast samplers already run few steps per launch)."""
    seg_n = max(1, int(cfg.diffusion.launch_segments or 1))
    if seg_n > 1 and (cfg.diffusion.sampler != "ddpm"
                      or cfg.diffusion.restart_intervals):
        raise ValueError(
            "diffusion.launch_segments splits the ancestral T-step chain "
            "across device launches; it requires diffusion.sampler=ddpm "
            "without restart_intervals (the fast samplers already run "
            "few steps per launch)")
    return seg_n


def _segmented_chain(cfg: Config, sched, eps_fn, seg_n: int):
    """Ancestral sampling as ``seg_n`` host-chained device launches.

    Bit-identical to one `core.sampling.sample` call with the same key: the
    scan's carried PRNG key is returned from each launch and threaded into
    the next (`denoise_segment(return_key=True)`). Exists to bound
    per-launch DEVICE time — a chunk*batch x T=1000 launch of the ch=128
    256x256 flagship runs minutes on-device, and TPU-worker watchdogs kill
    the worker mid-flight ("TPU worker process crashed or restarted",
    observed live on `experiments/flagship256_search.py`).
    """
    import functools

    from ..core import denoise_segment

    T = sched.T
    cuts = sorted({round(T * i / seg_n) for i in range(seg_n + 1)})
    assert cuts[0] == 0 and cuts[-1] == T
    bounds = [(cuts[i + 1], cuts[i]) for i in range(len(cuts) - 1)][::-1]

    @functools.partial(jax.jit, static_argnums=(2, 3))
    def _seg(x, k, hi, lo):
        return denoise_segment(sched, eps_fn, x, k, hi, lo,
                               clip_denoised=cfg.diffusion.clip_denoised,
                               return_key=True)

    def run(x, key):
        for hi, lo in bounds:
            x, key = _seg(x, key, hi, lo)
        return jnp.clip(x, -1.0, 1.0)

    return run


def make_eps_fn(model, params, conditional: bool, labels=None,
                w: float = 0.0, cfg_interval=None, weak_params=None):
    """eps_fn(x, t) for the sampler: plain for unconditional, dual-batched
    CFG mix for conditional (`DiffusionCondition.py:79-87` semantics).
    ``cfg_interval=(lo, hi)`` restricts guidance to that timestep range
    (single conditional forward outside it — core.process.make_cfg_eps_fn).
    With ``weak_params`` (diffusion.guidance=auto) the mix is
    autoguidance instead: strong vs weak conditional forwards
    (core.process.make_autoguidance_eps_fn)."""
    if not conditional:
        return lambda x, t: model.apply(params, x, t)
    assert labels is not None
    if weak_params is not None:
        from ..core import make_autoguidance_eps_fn
        return make_autoguidance_eps_fn(
            lambda x, t, lab: model.apply(params, x, t, lab),
            lambda x, t, lab: model.apply(weak_params, x, t, lab),
            labels, w, interval=cfg_interval)
    return make_cfg_eps_fn(
        lambda x, t, lab: model.apply(params, x, t, lab), labels, w,
        interval=cfg_interval)


def load_weak_params(cfg: Config, model, conditional: bool):
    """The weak-model weights for diffusion.guidance=auto, or None when
    CFG is selected. Loaded through the same checkpoint path as eval
    weights (full/weights-only, EMA preference, cross-T surgery)."""
    if cfg.diffusion.guidance != "auto":
        return None
    if not cfg.diffusion.weak_load_weight:
        raise ValueError(
            "diffusion.guidance=auto needs diffusion.weak_load_weight "
            "(an under-trained checkpoint of the same architecture)")
    if not conditional:
        raise ValueError(
            "diffusion.guidance=auto requires a conditional model "
            "(autoguidance mixes two label-conditioned forwards)")
    return load_eval_params(cfg, model, conditional,
                            name=cfg.diffusion.weak_load_weight)


# ---------------------------------------------------------------------------
# Train


def make_train_key(cfg: Config) -> jax.Array:
    """Training key per train.prng_impl — "rbg" is the TPU-native generator
    (cheaper dropout-mask bits, docs/PERF.md "ViT denoiser"; different
    random stream than the default threefry). Used by every training entry
    point (train AND finetune-t)."""
    if cfg.train.prng_impl == "threefry":
        return jax.random.PRNGKey(cfg.seed)
    return jax.random.key(cfg.seed, impl=cfg.train.prng_impl)


def resolve_track_metrics(cfg: Config) -> bool:
    """train.track_metrics=None means auto: tracked eval ON (the reference
    always evaluates during training, `Train.py:719-803`) except on the
    test-only synthetic blobs."""
    t = cfg.train.track_metrics
    if cfg.diffusion.restart_intervals and (t is None or t):
        # tracked eval snapshots the ancestral chain; under a restart
        # spec fall back to grid sampling (which honors restarts via
        # run_sampler) instead of crashing the run at its first eval
        import warnings
        warnings.warn(
            "train.track_metrics disabled: diffusion.restart_intervals "
            "is set and the metric-tracked sampler only follows the "
            "plain ancestral chain (see sample_with_metrics).",
            stacklevel=2)
        return False
    if t is None:
        return cfg.data.dataset != "synthetic"
    return bool(t)


def _train_mesh(cfg: Config):
    """Training mesh + the seq mesh to scope for the run's duration.

    Pure-DP by default. With train.spatial_shard=K the devices factor
    into (data=n/K, seq=K) and image rows shard over 'seq'
    (parallel.spatial_sharding); the same mesh is the ring-attention axis.
    Memory (MEASURED, docs/PERF.md "The memory claim, MEASURED"): per-chip
    activations drop ~1/K only when the data axis is exhausted (batch <=
    data shards — serving/huge-image work); at fixed global batch the
    (n/K, K) refactor saves nothing (+6-26% halo/ring overhead). With spatial_shard=1 but
    attention_impl=ring, the seq axis is sized 1 (the ring degenerates to
    local attention) so ring training PRESERVES data parallelism — the
    tokens-over-all-devices default layout is a latency-serving layout,
    wrong for a batch-sharded train step."""
    K = max(1, int(cfg.train.spatial_shard))
    n = jax.device_count()
    if K == 1:
        if cfg.model.attention_impl == "ring":
            mesh = make_mesh((n, 1), ("data", "seq"))
            print("[runner] attention_impl=ring with spatial_shard=1: "
                  "ring runs with a size-1 seq axis during training "
                  "(local attention, full data parallelism); set "
                  "train.spatial_shard>1 to actually shard tokens")
            return mesh, 1, mesh
        return make_mesh(axis_names=("data",)), 1, None
    if n % K:
        raise ValueError(
            f"train.spatial_shard={K} must divide device count {n}")
    if cfg.data.img_size % K:
        raise ValueError(
            f"train.spatial_shard={K} must divide img_size "
            f"{cfg.data.img_size} (image rows shard evenly)")
    mesh = make_mesh((n // K, K), ("data", "seq"))
    return mesh, K, mesh


def train(cfg: Config, max_steps: Optional[int] = None) -> dict:
    """Full training loop. Returns summary dict (final loss, ckpt paths)."""
    from ..parallel import seq_mesh_scope
    mesh, spatial_k, seq_mesh = _train_mesh(cfg)
    # scope (not leak) the run's ring/spatial layout — restored on exit
    with seq_mesh_scope(seq_mesh):
        return _train_impl(cfg, mesh, spatial_k, max_steps)


def _train_impl(cfg: Config, mesh, spatial_k: int,
                max_steps: Optional[int] = None) -> dict:
    model, conditional = build_model(cfg)
    sched = build_schedule(cfg)
    images, labels = load_dataset(cfg)

    # Metric-tracked eval during training (C23, `Train.py:516-536,719-803`):
    # hold out a val split whose real features anchor FID/CLIP, and run
    # tracked sampling every eval_freq epochs. Default (None) is ON — the
    # reference always evaluates — except on the test-only synthetic blobs.
    track = resolve_track_metrics(cfg)
    feature_fn = logit_fn = clip_feature_fn = None
    real_features = real_clip_features = None
    if track:
        from ..metrics import default_extractors, make_clip_feature_fn
        n_val = max(1, int(len(images) * cfg.data.val_ratio))
        perm = np.random.default_rng(cfg.data.seed).permutation(len(images))
        if cfg.train.use_val_for_eval:
            val_unit = (images[perm[:n_val]] + 1.0) / 2.0
            images = images[perm[n_val:]]
            if labels is not None:
                labels = labels[perm[n_val:]]
        else:
            # config.yaml `use_val_for_eval: false`: real stats from the
            # training set, nothing held out (`Train.py:516-536`)
            val_unit = (images[perm[:n_val]] + 1.0) / 2.0
        feature_fn, logit_fn, provenance = default_extractors()
        logit_fn, is_provenance = resolve_is_logit_fn(cfg, logit_fn,
                                                      provenance)
        clip_feature_fn = make_clip_feature_fn()
        print(f"[train] tracked-metric extractor: {provenance}; "
              f"IS logits: {is_provenance}")
        real_features = compute_real_features(
            val_unit, feature_fn, num_samples=cfg.train.fid_num_real_samples)
        if clip_feature_fn is not None:
            real_clip_features = compute_real_features(
                val_unit, clip_feature_fn,
                num_samples=cfg.train.clip_num_real_samples)

    it = BatchIterator(images, labels if conditional else None,
                       cfg.train.batch_size, seed=cfg.data.seed)
    if len(it) == 0:
        raise ValueError(
            f"train.batch_size={cfg.train.batch_size} exceeds the dataset "
            f"({len(images)} images) — no full batch can be formed")
    steps_per_epoch = len(it)

    params = init_params(cfg, model, conditional)
    if cfg.train.training_load_weight:
        params = restore_params(
            os.path.join(cfg.save_weight_dir, cfg.train.training_load_weight),
            template=params)

    tx = make_optimizer(OptimizerConfig(
        lr=cfg.train.lr, weight_decay=cfg.train.weight_decay,
        grad_clip=cfg.train.grad_clip, multiplier=cfg.train.multiplier,
        epochs=cfg.train.epoch, steps_per_epoch=steps_per_epoch,
        ema_decay=cfg.train.ema_decay))
    state = create_train_state(params, tx,
                               ema=cfg.train.ema_decay is not None)

    shardings = param_sharding(state.params, mesh)
    state = state.replace(
        params=jax.tree.map(jax.device_put, state.params, shardings),
        ema_params=(jax.tree.map(jax.device_put, state.ema_params, shardings)
                    if state.ema_params is not None else None))

    step_fn = make_train_step(
        lambda p, *a, **kw: model.apply(p, *a, **kw), sched, tx,
        conditional=conditional,
        loss_reduction=cfg.train.loss_reduction,
        loss_weighting=cfg.train.loss_weighting,
        snr_gamma=cfg.train.snr_gamma,
        label_dropout=cfg.train.label_dropout,
        ema_decay=cfg.train.ema_decay)

    # Representation-extraction hook (C28, `TrainCondition.py:66-107`):
    # every `extract_representation_freq` batches, capture the pre-tail
    # activation for the batch; saved per-epoch as .npz.
    extract_freq = cfg.train.extract_representation_freq
    if extract_freq and conditional:
        @jax.jit
        def repr_fn(params, x, t, labels):
            _, rep = model.apply(params, x, t, labels,
                                 return_representation=True)
            return rep
    else:
        repr_fn = None

    logger = MetricsLogger(
        os.path.join(cfg.metrics_save_dir, "train_metrics.jsonl"),
        also_print=True)
    key = make_train_key(cfg)
    losses = []   # device scalars; synced once at the end (not per step)
    ckpts = []
    metrics_history = []
    step = 0
    t0 = time.time()
    from ..data.datasets import prefetch_to_device, threaded_prefetch
    from ..parallel import batch_sharding
    from ..train.checkpoint import AsyncCheckpointManager
    from ..utils.profiling import trace_steps
    b_sharding = batch_sharding(mesh)
    if spatial_k > 1:
        from ..parallel import spatial_sharding
        b_sharding = {"image": spatial_sharding(mesh),
                      "label": batch_sharding(mesh)}
    ckpt_mgr = AsyncCheckpointManager() if cfg.train.async_checkpoint else None
    profiler = trace_steps(cfg.train.profile_steps,
                           os.path.join(cfg.metrics_save_dir, "trace"))
    for epoch in range(cfg.train.epoch):
        epoch_reprs, epoch_repr_labels = [], []

        def host_batches():
            for b in it:
                if conditional:
                    yield {"image": b["image"], "label": b["label"]}
                else:
                    yield {"image": b["image"]}

        # prefetch (depth 2): the host side of the pipeline runs on a
        # producer thread and the next batch transfers (sharded over the
        # mesh) while the current step computes
        _prefetch = (threaded_prefetch if cfg.train.threaded_input
                     else prefetch_to_device)
        for batch_i, hbatch in enumerate(
                _prefetch(host_batches(), size=2, sharding=b_sharding)):
            key, skey = jax.random.split(key)
            with profiler.step():
                state, metrics = step_fn(state, hbatch, skey)
            step += 1
            # keep the loss as a device scalar: no host round-trip in the
            # hot loop (the reference syncs with loss.item() every step,
            # `Train.py:704`)
            losses.append(metrics["loss"])
            if (repr_fn is not None and extract_freq
                    and batch_i % extract_freq == 0):
                labels_p1 = hbatch["label"].astype(jnp.int32) + 1
                t_mid = jnp.full((hbatch["image"].shape[0],), sched.T // 2,
                                 jnp.int32)
                rep = repr_fn(state.params, hbatch["image"], t_mid,
                              labels_p1)
                # global-average-pool spatial dims for compact storage
                epoch_reprs.append(np.asarray(rep.mean(axis=(1, 2))))
                epoch_repr_labels.append(np.asarray(hbatch["label"]))
            if max_steps is not None and step >= max_steps:
                break
        if epoch_reprs and cfg.train.save_representations:
            rep_dir = os.path.join(cfg.save_weight_dir, "representations")
            os.makedirs(rep_dir, exist_ok=True)
            np.savez(os.path.join(rep_dir, f"epoch_{epoch}.npz"),
                     representations=np.concatenate(epoch_reprs),
                     labels=np.concatenate(epoch_repr_labels))
        # one sync per epoch: also materialise this epoch's device loss
        # scalars to host floats so HBM buffers don't accumulate across a
        # long run
        n_new = sum(1 for x in losses if not isinstance(x, float))
        if n_new:
            losses[-n_new:] = [float(v) for v in
                               jax.device_get(losses[-n_new:])]
        logger.log({"epoch": epoch, "step": step,
                    "loss": losses[-1] if losses else float("nan"),
                    "elapsed_s": time.time() - t0})
        if (epoch + 1) % cfg.train.model_save_freq == 0 or \
                epoch == cfg.train.epoch - 1:
            path = os.path.join(cfg.save_weight_dir, f"ckpt_{epoch}")
            if ckpt_mgr is not None:
                ckpt_mgr.save(path, jax.device_get(state))
            else:
                save_checkpoint(path, jax.device_get(state))
            ckpts.append(path)
        if (epoch + 1) % cfg.train.eval_freq == 0:
            if track:
                eval_params = (state.ema_params
                               if state.ema_params is not None
                               else state.params)
                out = sample_with_metrics(
                    cfg, eval_params, feature_fn=feature_fn,
                    logit_fn=logit_fn, real_features=real_features,
                    clip_feature_fn=clip_feature_fn,
                    real_clip_features=real_clip_features,
                    tag=f"epoch_{epoch}")
                final = out["history"][-1] if out["history"] else None
                metrics_history.append({"epoch": epoch,
                                        "history": out["history"]})
                if final is not None:
                    logger.log({"epoch": epoch, "eval_fid": final[1],
                                "eval_is": final[2], "eval_clip": final[3]})
            else:
                _sample_grid_during_training(cfg, model, state, conditional,
                                             epoch, key)
        if max_steps is not None and step >= max_steps:
            break

    if ckpt_mgr is not None:
        ckpt_mgr.close()
    losses = [float(x) for x in jax.device_get(losses)]
    plot_loss_curve(losses, os.path.join(cfg.metrics_save_dir,
                                         "loss_curve.png"))
    logger.close()
    return {"final_loss": losses[-1] if losses else None,
            "steps": step, "checkpoints": ckpts, "state": state,
            "metrics_history": metrics_history}


def _spatial_mesh(cfg: Config, img_h: int):
    """train.spatial_shard applies at inference too: returns the
    data x seq mesh to sample under (scope it with `seq_mesh_scope` so
    ring attention rides the same axis and nothing leaks), or None —
    loudly — when the shapes don't tile or the run is multi-host (the
    host fetches of sampled images cannot span non-addressable devices,
    so multi-host inference stays per-host unsharded)."""
    K = max(1, int(cfg.train.spatial_shard))
    if K == 1:
        return None
    if jax.process_count() > 1:
        print(f"[runner] spatial_shard={K} ignored at inference under "
              "multi-host (sampled images are fetched to each host)")
        return None
    n = jax.device_count()
    if n % K or img_h % K:
        print(f"[runner] spatial_shard={K} ignored at inference: needs "
              f"K | device_count ({n}) and K | H ({img_h})")
        return None
    return make_mesh((n // K, K), ("data", "seq"))


def _spatial_put(mesh, x):
    """Place the initial noise on the spatial mesh: H over 'seq', batch
    over 'data' when it tiles (else replicated) — exactness proven in
    test_spatial_partition.py."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import spatial_sharding
    if mesh.shape["data"] > 1 and x.shape[0] % mesh.shape["data"] == 0:
        return jax.device_put(x, spatial_sharding(mesh))
    return jax.device_put(x, NamedSharding(mesh, P(None, "seq")))


def _sample_grid_during_training(cfg, model, state, conditional, epoch, key):
    from ..parallel import seq_mesh_scope
    sched = build_schedule(cfg, inference=True)
    eval_bs = cfg.train.eval_batch_size or min(cfg.train.batch_size, 64)
    params = state.ema_params if state.ema_params is not None else state.params
    kx, ks = jax.random.split(jax.random.fold_in(key, epoch))
    if conditional:
        labels = (jnp.arange(eval_bs) % cfg.model.num_labels) + 1
        eps_fn = make_eps_fn(model, params, True, labels, cfg.diffusion.w,
                             cfg_interval=cfg.diffusion.cfg_interval,
                             weak_params=load_weak_params(
                                 cfg, model, True))
    else:
        eps_fn = make_eps_fn(model, params, False)
    smesh = _spatial_mesh(cfg, cfg.data.img_size)
    with seq_mesh_scope(smesh):
        x_T = _spatial_put(smesh, jax.random.normal(
            kx, (eval_bs, cfg.data.img_size, cfg.data.img_size, 3)))
        imgs = run_sampler(cfg, sched, eps_fn, x_T, ks)
    save_image_grid(np.asarray(imgs),
                    os.path.join(cfg.sampled_dir,
                                 f"epoch_{epoch}_sampled.png"),
                    nrow=cfg.nrow)


# ---------------------------------------------------------------------------
# Eval (C27/C29)


def evaluate(cfg: Config, params=None) -> dict:
    model, conditional = build_model(cfg)
    if params is None:
        params = load_eval_params(cfg, model, conditional)

    from ..parallel import seq_mesh_scope
    sched = build_schedule(cfg, inference=True)
    eval_bs = cfg.train.eval_batch_size or min(cfg.train.batch_size, 64)
    key = jax.random.PRNGKey(cfg.seed)
    kx, ks = jax.random.split(key)
    if conditional:
        labels = (jnp.arange(eval_bs) % cfg.model.num_labels) + 1
        eps_fn = make_eps_fn(model, params, True, labels, cfg.diffusion.w,
                             cfg_interval=cfg.diffusion.cfg_interval,
                             weak_params=load_weak_params(
                                 cfg, model, True))
    else:
        eps_fn = make_eps_fn(model, params, False)

    seg_n = _validated_launch_segments(cfg)
    smesh = _spatial_mesh(cfg, cfg.data.img_size)
    with seq_mesh_scope(smesh):
        x_T = _spatial_put(smesh, jax.random.normal(
            kx, (eval_bs, cfg.data.img_size, cfg.data.img_size, 3)))
        # save the initial noise grid too (reference saves both,
        # `Train.py:826-836`)
        os.makedirs(cfg.sampled_dir, exist_ok=True)
        save_image_grid(np.asarray(jnp.clip(x_T * 0.5, -1, 1)),
                        os.path.join(cfg.sampled_dir,
                                     cfg.sampled_noisy_img_name),
                        nrow=cfg.nrow)
        if seg_n > 1:
            # bounded launches, bit-identical chain: one full-width
            # (ch=128, 256x256) batch x T=1000 launch runs minutes of
            # device time, which TPU-worker watchdogs kill
            imgs = _segmented_chain(cfg, sched, eps_fn, seg_n)(x_T, ks)
        else:
            imgs = run_sampler(cfg, sched, eps_fn, x_T, ks)
    out_path = os.path.join(cfg.sampled_dir, cfg.sampled_img_name)
    save_image_grid(np.asarray(imgs), out_path, nrow=cfg.nrow)
    return {"images": np.asarray(imgs), "path": out_path}


# ---------------------------------------------------------------------------
# Metric-tracked inference (C24/C31)


def compute_real_features(images_unit: np.ndarray, feature_fn,
                          num_samples: int = 5000,
                          batch_size: int = 64) -> np.ndarray:
    """Real-feature precompute (C25, `Train.py:169-244`): stream the first
    `num_samples` images (in [0,1]) through the extractor, accumulate on
    host."""
    n = min(num_samples, len(images_unit))
    feats = []
    for i in range(0, n, batch_size):
        feats.append(np.asarray(
            feature_fn(jnp.asarray(images_unit[i:i + batch_size]))))
    return np.concatenate(feats)


def resolve_is_logit_fn(cfg: Config, inception_logit_fn,
                        inception_provenance: str):
    """Pick the logit source for tracked IS (train.is_logit_source).

    VERDICT r4 weak #4: under the random-weight Inception proxy the
    classifier head yields constant splits, so tracked IS is exactly 1.0
    at every checkpoint — plumbing signal only. A trained in-domain
    SmallCNN (committed under artifacts/) restores real signal; "auto"
    prefers pretrained Inception, then a matching classifier checkpoint,
    then the Inception proxy as-is. Returns (logit_fn, provenance).
    """
    src = (cfg.train.is_logit_source or "auto").strip()
    if src == "inception":
        return inception_logit_fn, inception_provenance
    if src == "auto":
        if inception_provenance == "pretrained":
            return inception_logit_fn, inception_provenance
        cand = os.path.join(
            cfg.save_weight_dir,
            f"classifier_{cfg.data.dataset}{cfg.data.img_size}")
        if not os.path.isdir(cand):
            return inception_logit_fn, inception_provenance
        src = cand
    from ..models.classifier import load_classifier_extractors
    _, logit_fn, provenance = load_classifier_extractors(src)
    return logit_fn, provenance


def sample_with_metrics(cfg: Config, params, feature_fn=None,
                        logit_fn=None, real_features=None,
                        clip_feature_fn=None,
                        real_clip_features=None, tag: str = "") -> dict:
    """Sample while tracking FID/IS every `metric_interval` denoising steps.

    On-device snapshot collection (core.sample_with_snapshots), host-side
    float64 Fréchet — the reference recomputed Inception forward passes
    inside its Python sampling loop (`Train.py:25-166`).
    feature_fn/logit_fn are pluggable extractors (see `metrics.features`).
    """
    from ..metrics import frechet_distance, gaussian_stats
    from ..metrics.is_score import inception_score

    from ..parallel import seq_mesh_scope
    if cfg.diffusion.restart_intervals:
        # the snapshot sampler tracks the ANCESTRAL chain; silently
        # ignoring the restart spec would misstate what the metric
        # history describes
        raise ValueError(
            "diffusion.restart_intervals is not supported on the "
            "metric-tracked sampling path (inference-metrics / training "
            "tracked eval) — restart chains re-traverse intervals, so "
            "per-step snapshots would not be the monotone t-history the "
            "metrics report. Use `eval` or `search` with restarts, or "
            "clear restart_intervals here.")
    model, conditional = build_model(cfg)
    sched = build_schedule(cfg, inference=True)
    eval_bs = cfg.train.eval_batch_size or min(cfg.train.batch_size, 64)
    key = jax.random.PRNGKey(cfg.seed)
    kx, ks = jax.random.split(key)
    if conditional:
        labels = (jnp.arange(eval_bs) % cfg.model.num_labels) + 1
        eps_fn = make_eps_fn(model, params, True, labels, cfg.diffusion.w,
                             cfg_interval=cfg.diffusion.cfg_interval,
                             weak_params=load_weak_params(
                                 cfg, model, True))
    else:
        eps_fn = make_eps_fn(model, params, False)

    # `eval_metric_interval` (config.yaml) coarsens metric tracking on
    # evaluation/inference runs; None falls back to the training interval
    interval = cfg.train.eval_metric_interval or cfg.train.metric_interval
    smesh = _spatial_mesh(cfg, cfg.data.img_size)
    with seq_mesh_scope(smesh):
        x_T = _spatial_put(smesh, jax.random.normal(
            kx, (eval_bs, cfg.data.img_size, cfg.data.img_size, 3)))
        x0, ts, snaps = sample_with_snapshots(
            sched, eps_fn, x_T, ks, interval=interval,
            clip_denoised=cfg.diffusion.clip_denoised)

    history = []
    mu_r = sigma_r = None
    if real_features is not None:
        mu_r, sigma_r = gaussian_stats(real_features)
    for i, t in enumerate(np.asarray(ts)):
        snap = jnp.clip(snaps[i], -1, 1)
        unit = (np.asarray(snap) + 1.0) / 2.0
        fid = float("nan")
        is_mean = float("nan")
        clip_s = float("nan")
        if feature_fn is not None and mu_r is not None:
            try:
                feats = np.asarray(feature_fn(jnp.asarray(unit)))
                mu_f, sigma_f = gaussian_stats(feats)
                fid = frechet_distance(mu_r, sigma_r, mu_f, sigma_f)
            except Exception:
                pass
        if logit_fn is not None:
            try:
                # reference uses the 10-split protocol
                # (`utils/metrics.py:377-417`); configurable via
                # train.is_splits, clamped so every split is non-empty
                splits = max(1, min(cfg.train.is_splits, len(unit)))
                is_mean, _ = inception_score(logit_fn, jnp.asarray(unit),
                                             splits=splits)
            except Exception:
                pass
        if clip_feature_fn is not None and real_clip_features is not None:
            # mean fake<->real CLIP-feature cosine (`metrics.py:502-531`)
            try:
                f = np.asarray(clip_feature_fn(jnp.asarray(unit)))
                f = f / (np.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
                r = np.asarray(real_clip_features)
                r = r / (np.linalg.norm(r, axis=-1, keepdims=True) + 1e-8)
                clip_s = float((f @ r.T).mean())
            except Exception:
                pass
        history.append((int(t), fid, is_mean, clip_s))

    os.makedirs(cfg.metrics_save_dir, exist_ok=True)
    suffix = f"_{tag}" if tag else ""
    with open(os.path.join(cfg.metrics_save_dir,
                           f"metrics_history{suffix}.json"), "w") as f:
        json.dump([{"t": h[0], "fid": h[1], "is": h[2], "clip": h[3]}
                   for h in history], f, indent=2, default=float)
    plot_metrics_curves(history,
                        os.path.join(cfg.metrics_save_dir,
                                     f"metrics_curves{suffix}.png"),
                        T=sched.T)
    # descriptive filename like `abstract_metrics…py:554-601`
    final_fid = history[-1][1] if history else float("nan")
    stamp = time.strftime("%Y%m%d_%H%M%S")
    name = (f"sampled{suffix}_T{sched.T}_bs{eval_bs}"
            f"_fid{final_fid:.2f}_{stamp}.png")
    save_image_grid(np.asarray(x0), os.path.join(cfg.sampled_dir, name),
                    nrow=cfg.nrow)
    return {"images": np.asarray(x0), "history": history}


def inference_metrics(cfg: Config, feature_fn=None, logit_fn=None,
                      clip_feature_fn=None) -> dict:
    """The full inference-metrics pipeline (C31,
    `/root/reference/abstract_metrics_from_pretrained_ddpm.py:498-646`):
    load a checkpoint — full training checkpoints included, preferring EMA
    weights, with cross-T time-embedding surgery (`:126-277`) — precompute
    real Inception/CLIP features from the configured dataset, and run
    metric-tracked sampling."""
    from ..metrics import default_extractors, make_clip_feature_fn

    model, conditional = build_model(cfg)
    params = load_eval_params(cfg, model, conditional)

    provenance = is_provenance = "custom"
    if feature_fn is None:
        feature_fn, default_logit_fn, provenance = default_extractors()
        if logit_fn is None:
            logit_fn, is_provenance = resolve_is_logit_fn(
                cfg, default_logit_fn, provenance)
        print(f"feature extractor: {provenance}; IS logits: "
              f"{is_provenance}")
    if clip_feature_fn is None:
        clip_feature_fn = make_clip_feature_fn()

    real_features = real_clip_features = None
    try:
        images, _ = load_dataset(cfg)
        unit = (images + 1.0) / 2.0
        if feature_fn is not None:
            real_features = compute_real_features(
                unit, feature_fn, num_samples=cfg.train.fid_num_real_samples)
        if clip_feature_fn is not None:
            real_clip_features = compute_real_features(
                unit, clip_feature_fn,
                num_samples=cfg.train.clip_num_real_samples)
    except Exception as e:
        print(f"no real dataset available ({e}); FID/CLIP will be NaN")
    out = sample_with_metrics(
        cfg, params, feature_fn=feature_fn, logit_fn=logit_fn,
        real_features=real_features, clip_feature_fn=clip_feature_fn,
        real_clip_features=real_clip_features)
    # record extractor provenance next to the history so no FID number
    # leaves the tool without its comparability caveat
    with open(os.path.join(cfg.metrics_save_dir, "metrics_meta.json"),
              "w") as f:
        json.dump({"feature_extractor": provenance,
                   "is_logit_source": is_provenance,
                   "clip_tracking": clip_feature_fn is not None,
                   "is_splits": cfg.train.is_splits,
                   "comparable_to_published_fid":
                       provenance == "pretrained"}, f, indent=2)
    out["provenance"] = provenance
    out["is_logit_source"] = is_provenance
    return out


# ---------------------------------------------------------------------------
# Search CLI (un-wired in the reference)


def build_cli_verifier(cfg: Config, conditional: bool, eval_bs: int):
    """Every verifier the repo's experiments use, reachable from the CLI
    (`search.verifier=`): the heuristics (oracle / self_supervised /
    aesthetic) plus the weight-backed ones — classifier (SmallCNN
    checkpoint), clip (text-image cosine), ensemble (-FID + w*IS on-device
    Inception). The reference never wired its search library to any entry
    point (SURVEY §1 L3)."""
    from ..search import (aesthetic_score, batch_pixel_variance_score,
                          classifier_verifier, ensemble_fid_is_verifier,
                          self_supervised_verifier, supervised_verifier)

    s = cfg.search
    simple = {
        "oracle": batch_pixel_variance_score,
        "self_supervised": self_supervised_verifier(),
        "aesthetic": aesthetic_score,
    }.get(s.verifier)
    if simple is not None:
        return simple

    if s.verifier == "classifier":
        if not s.classifier_ckpt:
            raise ValueError(
                "search.verifier=classifier needs search.classifier_ckpt "
                "(save one with models.classifier.save_classifier)")
        from ..models import load_classifier
        path = s.classifier_ckpt
        if not os.path.isabs(path):
            path = os.path.join(cfg.save_weight_dir, path)
        logit_fn, _, ccfg = load_classifier(path)
        if s.target_label is not None:
            targets = jnp.full((eval_bs,), int(s.target_label), jnp.int32)
        elif conditional:
            # the sampler conditions on labels (arange % num_labels) + 1;
            # the classifier scores the corresponding true classes
            targets = (jnp.arange(eval_bs) % cfg.model.num_labels
                       ).astype(jnp.int32)
        else:
            raise ValueError(
                "unconditional classifier search needs search.target_label")
        assert int(jnp.max(targets)) < ccfg.num_classes, (
            f"target labels exceed classifier classes ({ccfg.num_classes})")
        return classifier_verifier(logit_fn, targets)

    if s.verifier == "clip":
        from ..metrics import make_clip_feature_fn
        clip_fn = make_clip_feature_fn()
        if clip_fn is None:
            raise ValueError(
                "search.verifier=clip needs CLIP weights: set "
                "$ITSD_CLIP_WEIGHTS to an OpenAI CLIP state dict")
        text_feats = None
        if s.clip_text_features:
            text_feats = jnp.asarray(np.load(s.clip_text_features))
        # with text features: text-image cosine (C17); without: mean
        # feature norm, the reference's no-prompt proxy (verifier.py:163)
        return supervised_verifier(clip_fn, text_feats)

    if s.verifier == "ensemble":
        from ..metrics.features import make_inception_extractors
        from ..metrics.inception import inception_v3, preprocess
        feature_fn, _, provenance = make_inception_extractors()
        # one forward feeding both FID features and IS logits inside the
        # jitted search
        from ..metrics.features import _inception_params
        inc_params, _ = _inception_params(
            os.environ.get("ITSD_INCEPTION_WEIGHTS") or None)
        run_fn = lambda unit: inception_v3(inc_params, preprocess(unit))
        images, _ = load_dataset(cfg)
        unit = (images + 1.0) / 2.0
        real_feats = compute_real_features(
            unit, feature_fn, num_samples=s.ensemble_num_real)
        print(f"[search] ensemble verifier: -FID + {s.ensemble_is_weight}"
              f"*IS, inception={provenance}, "
              f"{len(real_feats)} real images")
        return ensemble_fid_is_verifier(
            run_fn, real_feats, is_weight=s.ensemble_is_weight)

    raise ValueError(
        f"unknown search.verifier {s.verifier!r}; expected oracle | "
        "self_supervised | aesthetic | classifier | clip | ensemble")


def run_search(cfg: Config, params=None, verifier_fn=None) -> dict:
    from ..parallel import candidate_sharding, replicated
    from ..search import (gradient_search, path_search, random_search,
                          zero_order_search)

    if int(cfg.train.spatial_shard) > 1:
        # search scales via the CANDIDATE axis (candidates shard over the
        # same devices); spatially sharding each candidate too would split
        # the mesh against itself — be loud rather than silently ignore
        print("[runner] note: train.spatial_shard applies to train/eval/"
              "inference-metrics; search runs unsharded per candidate "
              "(candidates are the sharded axis)")
    model, conditional = build_model(cfg)
    if params is None:
        params = load_eval_params(cfg, model, conditional)
    sched = build_schedule(cfg, inference=True)
    s = cfg.search
    eval_bs = cfg.train.eval_batch_size or 8
    shape = (eval_bs, cfg.data.img_size, cfg.data.img_size, 3)

    # Candidate-axis SPMD (SURVEY §3.3, "the #1 TPU win"): candidates shard
    # over the mesh's data axis; params replicate. Only engaged when the
    # folded candidate*batch axis divides the device count evenly.
    n_dev = len(jax.devices())
    chunk = s.n_candidates
    if s.algorithm == "random" and s.candidate_chunk:
        chunk = min(s.candidate_chunk, s.n_candidates)
        if s.n_candidates % chunk:
            raise ValueError(
                f"search.candidate_chunk={chunk} must divide "
                f"n_candidates={s.n_candidates}")
    n_fold = eval_bs * {"random": chunk,
                        "zero_order": s.n_neighbors,
                        "path": s.n_paths,
                        "pruned": s.n_candidates,
                        "smc": s.n_candidates}.get(s.algorithm, 1)
    mesh = cand_sh = None
    if n_dev > 1 and n_fold % n_dev == 0:
        mesh = make_mesh(axis_names=("data",))
        cand_sh = candidate_sharding(mesh)
        params = jax.device_put(params, replicated(mesh))
        print(f"[search] sharding {n_fold} candidate rows over "
              f"{n_dev} devices")

    if conditional:
        labels = (jnp.arange(eval_bs) % cfg.model.num_labels) + 1
        eps_fn = make_eps_fn(model, params, True, labels, cfg.diffusion.w,
                             cfg_interval=cfg.diffusion.cfg_interval,
                             weak_params=load_weak_params(
                                 cfg, model, True))
    else:
        eps_fn = make_eps_fn(model, params, False)
    # Random and zero-order search denoise candidates with the configured
    # diffusion.sampler (searching over cheap second-order candidates
    # dominates ancestral ones at every fixed NFE budget, RESULTS.md
    # "Axis 3"). Path/pruned search denoise their SEGMENTS with the
    # configured sampler too (ddim/dpm -> _cli_segment); gradient search
    # differentiates through the DPM chain only when sampler=dpm.
    denoise_fn = lambda noise, k: run_sampler(cfg, sched, eps_fn, noise, k)

    if verifier_fn is None:
        verifier_fn = build_cli_verifier(cfg, conditional, eval_bs)

    key = jax.random.PRNGKey(cfg.seed)
    # random/zero-order/path are pure programs: jit them END-TO-END so the
    # candidate sweep is one compiled computation (re-invoking the eager
    # path would re-trace the sampler scan every call).
    from ..search.algorithms import SearchResult, _nan_to_neg_inf
    seg_n = _validated_launch_segments(cfg)
    seg_chain = None
    if seg_n > 1:
        if s.algorithm != "random":
            raise ValueError(
                "diffusion.launch_segments applies to eval and random "
                "search only (the other search algorithms interleave "
                "scoring with the chain)")
        seg_chain = _segmented_chain(cfg, sched, eps_fn, seg_n)
    if s.algorithm == "random":
        if seg_chain is not None:
            # The single-launch program decomposed into bounded launches:
            # generate -> seg_n chain segments -> score+argmax. Bit-identical
            # to the launch_segments=1 path (tests/test_search_segmented.py).
            @jax.jit
            def _gen(k):
                kn, kd = jax.random.split(k)
                noises = jax.random.normal(kn, (chunk,) + tuple(shape))
                flat = noises.reshape((chunk * shape[0],) + tuple(shape[1:]))
                if cand_sh is not None:
                    flat = jax.lax.with_sharding_constraint(flat, cand_sh)
                return noises, flat, kd

            @jax.jit
            def _pick(noises, flat):
                images = flat.reshape((chunk,) + tuple(shape))
                scores = jax.vmap(verifier_fn)(images)
                best = jnp.argmax(_nan_to_neg_inf(scores))
                return noises[best], scores[best], images[best], scores

            def _run(k):
                noises, x, kd = _gen(k)
                return _pick(noises, seg_chain(x, kd))
        else:
            @jax.jit
            def _run(k):
                r = random_search(k, shape, denoise_fn, verifier_fn,
                                  n_candidates=chunk, sharding=cand_sh)
                return (r.best_noise, r.best_score, r.best_images,
                        r.history["scores"])
        # One compiled program per chunk shape; chunks reuse it. The host
        # keeps the running argmax — a sync per chunk, not per candidate
        # (the reference syncs per candidate, `search_algorithm.py:65-82`).
        best = None
        all_scores = []
        for ci in range(s.n_candidates // chunk):
            # chunk 0 consumes `key` unchanged so the common unchunked call
            # is bit-identical to the pre-chunking seeded behaviour; later
            # chunks fold in their index
            kc = key if ci == 0 else jax.random.fold_in(key, ci)
            bn, bsc, bi, sc = _run(kc)
            bsc = float(bsc)
            all_scores.append(np.asarray(sc))
            # NaN-aware: a NaN chunk (e.g. bf16 overflow on some
            # candidates) must not beat a later finite one
            if (best is None or np.isnan(best[1])
                    or bsc > best[1]):
                best = (bn, bsc, bi)
        res = SearchResult(best[0], best[1], best[2],
                           {"scores": np.concatenate(all_scores)},
                           s.n_candidates)
    elif s.algorithm == "zero_order":
        init = jax.random.normal(jax.random.fold_in(key, 0), shape)

        @jax.jit
        def _run(k, init):
            r = zero_order_search(k, init, denoise_fn, verifier_fn,
                                  n_neighbors=s.n_neighbors,
                                  lambda_radius=s.lambda_radius,
                                  n_iterations=s.n_iterations,
                                  neighbor_mode=s.neighbor_mode,
                                  return_images=True, sharding=cand_sh)
            return (r.best_noise, r.best_score, r.best_images,
                    r.history["scores"])
        bn, bs, bi, sc = _run(key, init)
        res = SearchResult(
            bn, bs, bi,
            {"scores": sc, "candidates_per_iter": s.n_neighbors},
            s.n_iterations * s.n_neighbors + 1)
    elif s.algorithm == "path":
        steps = tuple(s.injection_steps)
        segment = _cli_segment(cfg, sched, eps_fn)

        @jax.jit
        def _run(k):
            r = path_search(k, sched, eps_fn, verifier_fn, shape,
                            n_paths=s.n_paths, n_active=s.n_active,
                            injection_steps=steps, delta_f=s.delta_f,
                            sharding=cand_sh,
                            clip_denoised=cfg.diffusion.clip_denoised,
                            segment=segment)
            return (r.best_noise, r.best_score, r.best_images,
                    r.history["scores"], r.history["final_scores"],
                    r.nfes)
        bn, bs, bi, sc, fsc, nfes = _run(key)
        res = SearchResult(
            bn, bs, bi,
            {"scores": sc, "final_scores": fsc,
             "injection_points": list(steps)},
            int(nfes))
    elif s.algorithm == "pruned":
        from ..search import pruned_search
        psched = tuple(tuple(int(v) for v in p) for p in s.prune_schedule)
        segment = _cli_segment(cfg, sched, eps_fn)

        @jax.jit
        def _run(k):
            r = pruned_search(k, sched, eps_fn, verifier_fn, shape,
                              n_candidates=s.n_candidates,
                              prune_schedule=psched, sharding=cand_sh,
                              clip_denoised=cfg.diffusion.clip_denoised,
                              segment=segment)
            # prune_scores is a tuple of static-shape arrays (one per
            # prune point) — returnable from jit alongside the finals
            return (r.best_noise, r.best_score, r.best_images,
                    r.history["final_scores"],
                    tuple(r.history["prune_scores"]), r.nfes)
        bn, bs, bi, fsc, psc, nfes = _run(key)
        # "scores" = the FULL initial pool's x0-hat scores (round 0), so
        # best-vs-median analyses see every candidate like the other
        # algorithms; survivors' final scores ride alongside
        res = SearchResult(
            bn, bs, bi,
            {"scores": (psc[0] if psc else fsc), "final_scores": fsc,
             "prune_scores": [np.asarray(a) for a in psc],
             "prune_schedule": list(psched)},
            int(nfes))
    elif s.algorithm == "smc":
        from ..search import smc_search
        rsteps = tuple(int(t) for t in s.smc_resample_steps)
        segment = _cli_segment(cfg, sched, eps_fn)

        @jax.jit
        def _run(k):
            r = smc_search(k, sched, eps_fn, verifier_fn, shape,
                           n_particles=s.n_candidates,
                           resample_steps=rsteps,
                           lambda_temp=s.smc_lambda,
                           ess_threshold=s.smc_ess_threshold,
                           lambda_scale=s.smc_lambda_scale,
                           sharding=cand_sh,
                           clip_denoised=cfg.diffusion.clip_denoised,
                           segment=segment)
            return (r.best_noise, r.best_score, r.best_images,
                    r.history["final_scores"],
                    tuple(r.history["resample_scores"]),
                    r.history["ess"], r.history["resampled"], r.nfes)
        bn, bs, bi, fsc, rsc, ess, resampled, nfes = _run(key)
        # "scores" = the initial pool's first-checkpoint x0-hat scores, so
        # best-vs-median analyses see every particle like the other
        # algorithms (pre-resampling — later rounds mix lineages)
        res = SearchResult(
            bn, bs, bi,
            {"scores": (rsc[0] if rsc else fsc), "final_scores": fsc,
             "resample_scores": [np.asarray(a) for a in rsc],
             "ess": np.asarray(ess), "resampled": np.asarray(resampled),
             "resample_steps": list(rsteps)},
            int(nfes))
        print(f"[search] smc ess per resample point: "
              f"{np.round(np.asarray(ess), 2).tolist()} "
              f"(resampled: {np.asarray(resampled).tolist()})")
    elif s.algorithm == "gradient":
        init = jax.random.normal(jax.random.fold_in(key, 0), shape)
        # diffusion.sampler=dpm: differentiate through the solver chain
        # (ddim_steps evals/iter) instead of the remat'd T-step chain
        solver_steps = (min(cfg.diffusion.ddim_steps, sched.T)
                        if cfg.diffusion.sampler == "dpm" else None)

        @jax.jit
        def _run(k, init):
            r = gradient_search(k, init, sched, eps_fn, verifier_fn,
                                n_iterations=s.n_iterations,
                                lr=s.gradient_lr, return_images=True,
                                solver_steps=solver_steps, sharding=cand_sh,
                                clip_denoised=cfg.diffusion.clip_denoised)
            return (r.best_noise, r.best_score, r.best_images,
                    r.history["scores"], r.history["grad_norms"])
        bn, bs, bi, sc, gns = _run(key, init)
        res = SearchResult(bn, bs, bi,
                           {"scores": sc, "grad_norms": gns},
                           s.n_iterations + 1)
    else:
        raise ValueError(f"unknown search algorithm: {s.algorithm!r}")

    # Verifier-hacking guard (paper §"verifier hacking"; RESULTS.md caught
    # it live at path-64): compare the winner's INDEPENDENT FID-proxy to an
    # unsearched baseline sample from the same denoiser.
    guard = None
    if s.guard_proxy and res.best_images is not None:
        from ..search.verifiers import make_fid_proxy

        images, _ = load_dataset(cfg)
        _proxy = make_fid_proxy(jnp.asarray(images[: s.guard_num_real]))

        # The baseline must come from the SAME chain the winner used, or
        # the sampler-quality gap masquerades as (or masks) hacking:
        # path/pruned winners are ancestral UNLESS segments are active
        # (diffusion.sampler=ddim|dpm routes their forks through
        # _cli_segment — then the configured sampler, = denoise_fn, is the
        # matching baseline); gradient follows diffusion.sampler only when
        # it is dpm; random/zero-order denoise with the configured sampler.
        path_like_ancestral = (
            s.algorithm in ("path", "pruned", "smc")
            and cfg.diffusion.sampler not in ("ddim", "dpm"))
        if path_like_ancestral or (
                s.algorithm == "gradient"
                and cfg.diffusion.sampler != "dpm"):
            base_fn = lambda n, k: sample(sched, eps_fn, n, k,
                                          clip_denoised=cfg.diffusion
                                          .clip_denoised)
        else:
            # with launch_segments active, the baseline draws must ride the
            # same bounded-launch chain (it IS the winner's chain, and a
            # single full-T launch is what the watchdog kills)
            base_fn = seg_chain if seg_chain is not None else denoise_fn
        # Pool the baseline over several independent seeded draws: at
        # eval_bs=4-8 one draw's Frechet-proxy estimate is high-variance
        # (rank-deficient covariances), so flagged/not-flagged at
        # guard_ratio could flip on sampling noise. The jitted base_fn
        # compiles once; extra draws are cheap relative to the search.
        # Draw 0 uses the original fold-in constants, so single-draw runs
        # are bit-identical to the pre-pooling seeded behaviour.
        draws = max(1, int(s.guard_baseline_draws))
        base_vals = []
        # seg_chain is already a host loop over jitted launches — jitting it
        # would fuse the segments back into one watchdog-length program
        jit_base = base_fn if base_fn is seg_chain and seg_chain is not None \
            else jax.jit(base_fn)
        for di in range(draws):
            base_imgs = jit_base(
                jax.random.normal(
                    jax.random.fold_in(key, 0x6a7d + 2 * di), shape),
                jax.random.fold_in(key, 0x6a7e + 2 * di))
            base_vals.append(float(_proxy(base_imgs)))
        base_mean = float(np.mean(base_vals))
        base_std = float(np.std(base_vals))
        guard = {"winner_fid_proxy": float(_proxy(res.best_images)),
                 "baseline_fid_proxy": base_mean,
                 "baseline_fid_proxy_std": base_std,
                 "baseline_fid_proxy_draws": base_vals,
                 "ratio_threshold": s.guard_ratio}
        guard["flagged"] = bool(
            guard["winner_fid_proxy"]
            > s.guard_ratio * max(base_mean, 1e-9))
        if guard["flagged"]:
            print(f"[search] WARNING: verifier-hacking guard tripped — "
                  f"winner FID-proxy {guard['winner_fid_proxy']:.3f} vs "
                  f"unsearched baseline {base_mean:.3f} +- {base_std:.3f} "
                  f"(n={draws} draws, >{s.guard_ratio}x): the verifier "
                  f"score improved at the expense of independent sample "
                  f"quality. Reduce the search budget or strengthen the "
                  f"verifier.", file=sys.stderr)

    os.makedirs(cfg.sampled_dir, exist_ok=True)
    if res.best_images is not None:
        save_image_grid(np.asarray(res.best_images),
                        os.path.join(cfg.sampled_dir,
                                     f"search_{s.algorithm}_best.png"),
                        nrow=cfg.nrow)
    return {"best_score": float(res.best_score), "nfes": res.nfes,
            "guard": guard, "result": res}


# ---------------------------------------------------------------------------
# T-extension fine-tune (C30)


def finetune_extended_T(cfg: Config, max_steps: Optional[int] = None) -> dict:
    """Load a checkpoint trained at some T, extend the time embedding to the
    configured (larger) T, freeze everything else, fine-tune."""
    if int(cfg.train.spatial_shard) > 1:
        print("[runner] note: train.spatial_shard is not applied by "
              "finetune-t (small embedding-only updates); it runs "
              "unsharded")
    model, conditional = build_model(cfg)
    sched = build_schedule(cfg)  # the NEW (extended) T
    assert cfg.test_load_weight, "finetune needs test_load_weight"
    path = os.path.join(cfg.save_weight_dir, cfg.test_load_weight)
    try:
        restored = restore_checkpoint(path)  # full training checkpoint
        params = restored.ema_params or restored.params
    except (KeyError, TypeError):
        params = restore_params(path, template=None)  # weights-only
    ckpt_T = detect_checkpoint_T(params)
    if ckpt_T is not None and ckpt_T != cfg.diffusion.T:
        params = extend_time_embedding(
            params, cfg.diffusion.T,
            strategy=cfg.train.time_embedding_strategy)

    images, labels = load_dataset(cfg)
    it = BatchIterator(images, labels if conditional else None,
                       cfg.train.batch_size, seed=cfg.data.seed)

    base_tx = make_optimizer(OptimizerConfig(
        lr=cfg.train.fine_tune_lr, weight_decay=cfg.train.weight_decay,
        grad_clip=cfg.train.grad_clip, multiplier=cfg.train.multiplier,
        epochs=cfg.train.epoch, steps_per_epoch=max(len(it), 1),
        ema_decay=None))
    tx = freeze_except_time_embedding(base_tx, params)
    state = create_train_state(params, tx, ema=False)
    step_fn = make_train_step(
        lambda p, *a, **kw: model.apply(p, *a, **kw), sched, tx,
        conditional=conditional, ema_decay=None,
        loss_reduction=cfg.train.loss_reduction,
        loss_weighting=cfg.train.loss_weighting,
        snr_gamma=cfg.train.snr_gamma,
        label_dropout=cfg.train.label_dropout)

    key = make_train_key(cfg)
    losses = []
    step = 0
    ckpts = []
    for epoch in range(cfg.train.epoch):
        for batch in it:
            key, skey = jax.random.split(key)
            state, metrics = step_fn(state, batch, skey)
            losses.append(float(metrics["loss"]))
            step += 1
            if max_steps is not None and step >= max_steps:
                break
        path = os.path.join(cfg.save_weight_dir,
                            f"fine_tuned_T{cfg.diffusion.T}_epoch_{epoch}")
        save_params(path, jax.device_get(state.params))
        ckpts.append(path)
        if max_steps is not None and step >= max_steps:
            break
    return {"final_loss": losses[-1] if losses else None,
            "checkpoints": ckpts, "state": state, "ckpt_T_detected": ckpt_T}
