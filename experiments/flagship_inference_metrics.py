"""Metric-tracked inference (C31) at the reference's flagship width.

Drives `runner.inference_metrics` — the product path behind
`python -m itsd_tpu.cli.main inference-metrics` — on the TRAINED ch=128
256x256 flagship artifact, at the reference's own EXTENDED-T inference
operating point (`/root/reference/config/inference_config.yaml:18-32`
runs inference_T=3000 on a T=1000-trained model): FID-proxy / IS / CLIP
similarity+diversity tracked across the denoising trajectory, with the
per-step x0-hat clamp (`diffusion.clip_denoised`) that keeps long bf16
chains finite.

Launch-bounded by construction: the snapshot sampler runs one
`eval_metric_interval`-step segment per device launch (eager host loop in
`sample_with_metrics`), so no single launch approaches the TPU-worker
watchdog that killed full-T=1000 single-launch programs at this width.

Usage: python experiments/flagship_inference_metrics.py [--inference-t 3000]
Writes: docs/results/flagship256_inference_metrics.json
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="shapes256_flagship")
    ap.add_argument("--inference-t", type=int, default=3000)
    ap.add_argument("--interval", type=int, default=250,
                    help="steps per tracked segment = steps per device "
                         "launch (~15-20 s at ch=128 batch 4)")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--is-splits", type=int, default=1,
                    help="IS split count. At batch 4 the reference's "
                         "10-split protocol clamps to 4 single-image "
                         "splits where IS is identically 1.0; one "
                         "4-image split makes the tracked column "
                         "informative (VERDICT r4 weak #4)")
    ap.add_argument("--num-real", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "results", "flagship256_inference_metrics.json"))
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import experiments.train_artifacts as ta
    from itsd_tpu.cli.runner import inference_metrics
    from itsd_tpu.utils.config import load_config

    a = ta.ARCHS[args.arch]
    mdir = os.path.join(REPO, "metrics_curves", "flagship256_inference")
    overrides = [
        "data.dataset=shapes", f"data.img_size={a['img']}",
        f"model.channel={a['ch']}",
        f"model.channel_mult={list(a['ch_mult'])}",
        f"model.attn={list(a['attn'])}",
        f"model.num_res_blocks={a['num_res_blocks']}",
        "model.time_embed=functional", "model.dtype=bfloat16",
        f"diffusion.T={ta.TRAIN_T}",
        f"diffusion.inference_T={args.inference_t}",
        "diffusion.clip_denoised=true",
        f"train.eval_metric_interval={args.interval}",
        f"train.eval_batch_size={args.batch}",
        f"train.is_splits={args.is_splits}",
        f"train.fid_num_real_samples={args.num_real}",
        f"train.clip_num_real_samples={args.num_real}",
        f"save_weight_dir={ta.ARTIFACTS}",
        f"test_load_weight={args.arch}",
        f"metrics_save_dir={mdir}",
        f"sampled_dir={os.path.join(REPO, 'sampled', 'flagship256_inference')}",
    ]
    cfg = load_config(None, overrides)

    def note(m):
        print(f"[f256-im] {m}", file=sys.stderr, flush=True)

    note(f"inference-metrics on {args.arch}: T={ta.TRAIN_T} model at "
         f"inference_T={args.inference_t}, interval {args.interval}, "
         f"batch {args.batch}, clip_denoised=true")
    t0 = time.time()
    out = inference_metrics(cfg)
    wall = time.time() - t0

    # history rows are (t, fid, is_mean, clip_sim) tuples. clip_sim is NaN
    # by design without $ITSD_CLIP_WEIGHTS (the reference degrades to
    # no-CLIP mode the same way, Train.py:609-617) — finiteness is judged
    # on the metrics actually tracked.
    hist = [{"t": int(t), "fid_proxy": float(fid), "is": float(is_m),
             "clip_sim": float(cs)} for t, fid, is_m, cs in out["history"]]
    finite = bool(np.isfinite([[r["fid_proxy"], r["is"]]
                               for r in hist]).all())
    clip_tracked = bool(np.isfinite([r["clip_sim"] for r in hist]).any())
    rec = {
        "workload": (f"inference-metrics (C31) on the trained ch={a['ch']} "
                     f"256x256 flagship at the reference's extended-T "
                     f"operating point (inference_T={args.inference_t} on a "
                     f"T={ta.TRAIN_T}-trained model, clip_denoised)"),
        "reference": "/root/reference/config/inference_config.yaml:18-32; "
                     "abstract_metrics_from_pretrained_ddpm.py:498-646",
        "device": "TPU v5 lite0",
        "model": f"ch={a['ch']} mult={a['ch_mult']} attn={a['attn']} img=256",
        "weights": f"trained EMA (artifacts/{args.arch})",
        "inference_T": args.inference_t,
        "interval": args.interval,
        "batch": args.batch,
        "is_splits": args.is_splits,
        "feature_extractor": out.get("provenance"),
        "is_logit_source": out.get("is_logit_source"),
        "clip_tracked": clip_tracked,
        "wall_s_incl_compile": round(wall, 1),
        "all_tracked_is_finite": bool(finite),
        "history": hist,
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    note(f"tracked {len(hist)} checkpoints in {wall:.0f}s; "
         f"finite={finite} -> {args.out}")


if __name__ == "__main__":
    main()
