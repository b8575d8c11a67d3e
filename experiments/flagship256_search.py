"""Inference-time search at the reference's flagship operating point:
256x256, UNet with attention at stage 2 (64x64 feature map = 4096 tokens,
where the reference's materialised score matrix is its scaling wall —
/root/reference/Diffusion/Model.py:152-161, config/config.yaml:17-31).

Runs best-of-N random search through the PRODUCT path (cli.runner.run_search
— the same jitted chunked program `python -m itsd_tpu.cli.main search`
drives) on the TRAINED shapes256_uncond artifact, scored by the trained
256x256 SmallCNN classifier (target-class log-probability). This is the
paper's search-axis claim executed at the resolution the reference only
ever configured, never demonstrated.

Usage: python experiments/flagship256_search.py [--candidates 16]
Writes: docs/results/flagship256_search.json + winner grid PNG.
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
    ap.add_argument("--candidates", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=2,
                    help="candidates per device launch (a 1000-step 256x256 "
                         "launch of chunk*batch rows must stay under the "
                         "TPU-worker watchdog, ~1 min device time)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--segments", type=int, default=8,
                    help="search.launch_segments: launches the T=1000 chain "
                         "is split into per chunk. At ch=128 a single "
                         "4-row x 1000-step launch runs >1 min of device "
                         "time and the TPU-worker watchdog kills the worker "
                         "(observed 2026-08-19); 125-step launches are safe")
    ap.add_argument("--target", type=int, default=3)
    ap.add_argument("--arch", default="shapes256_uncond",
                    choices=["shapes256_uncond", "shapes256_flagship"],
                    help="committed artifact to search (shapes256_flagship "
                         "= the reference's exact ch=128 width)")
    ap.add_argument("--sampler", default="ddpm", choices=["ddpm", "dpm"],
                    help="dpm = best-of-N over DPM-Solver++(2M)-"
                         "--sampler-steps candidates (the Axis-3 fixed-NFE "
                         "result at flagship width, ~1/50 the NFE of "
                         "T=1000 ancestral candidates)")
    ap.add_argument("--sampler-steps", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.out is None:
        suffix = "" if args.arch == "shapes256_uncond" else "_ch128"
        if args.sampler != "ddpm":
            suffix += f"_{args.sampler}{args.sampler_steps}"
        args.out = os.path.join(REPO, "docs", "results",
                                f"flagship256_search{suffix}.json")

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import experiments.train_artifacts as ta
    from itsd_tpu.cli.runner import run_search
    from itsd_tpu.utils.config import load_config

    a = ta.ARCHS[args.arch]
    overrides = [
        "data.dataset=synthetic", f"data.img_size={a['img']}",
        f"model.channel={a['ch']}",
        f"model.channel_mult={list(a['ch_mult'])}",
        f"model.attn={list(a['attn'])}",
        f"model.num_res_blocks={a['num_res_blocks']}",
        "model.time_embed=functional", "model.dtype=bfloat16",
        f"diffusion.T={ta.TRAIN_T}",
        f"save_weight_dir={ta.ARTIFACTS}",
        f"test_load_weight={args.arch}",
        "search.algorithm=random",
        f"search.n_candidates={args.candidates}",
        f"search.candidate_chunk={args.chunk}",
        # fast-sampler candidates run few steps per launch already; the
        # watchdog-bounding launch split applies to ancestral chains only
        f"search.launch_segments="
        f"{args.segments if args.sampler == 'ddpm' else 1}",
        f"diffusion.sampler={args.sampler}",
        f"diffusion.ddim_steps={args.sampler_steps}",
        "search.verifier=classifier",
        f"search.classifier_ckpt={os.path.join(ta.ARTIFACTS, 'classifier_shapes256')}",
        f"search.target_label={args.target}",
        f"train.eval_batch_size={args.batch}",
        f"sampled_dir={os.path.join(REPO, 'sampled', 'flagship256_search')}",
        "nrow=2",
    ]
    cfg = load_config(None, overrides)

    def note(m):
        print(f"[f256] {m}", file=sys.stderr, flush=True)

    note(f"best-of-{args.candidates} random search, trained 256x256 model, "
         f"classifier verifier (target class {args.target})")
    t0 = time.time()
    out = run_search(cfg)
    wall = time.time() - t0
    scores = np.asarray(out["result"].history["scores"], np.float64)
    steps_per_cand = (ta.TRAIN_T if args.sampler == "ddpm"
                      else args.sampler_steps)
    evals = args.candidates * args.batch * steps_per_cand
    chain = ("T=1000 ancestral"
             if args.sampler == "ddpm"
             else f"DPM-Solver++(2M)-{args.sampler_steps}")
    rec = {
        "workload": (f"flagship 256x256: best-of-{args.candidates} random "
                     f"search, {chain}, trained {args.arch} "
                     "(attention at 4096 tokens), classifier verifier"),
        "model": f"ch={a['ch']} mult={a['ch_mult']} attn={a['attn']} img=256",
        "weights": f"trained EMA (artifacts/{args.arch}, shapes256)",
        "verifier": ("trained SmallCNN depth-4 "
                     "(artifacts/classifier_shapes256): mean target-class "
                     "log-prob"),
        "sampler": args.sampler, "steps_per_candidate": steps_per_cand,
        "T": ta.TRAIN_T,
        "n_candidates": args.candidates, "per_candidate_batch": args.batch,
        "device": "TPU v5 lite0",
        "wall_s_incl_compile": wall,
        "model_evals": evals,
        "best_score": out["best_score"],
        "candidate_score_stats": {
            "median": float(np.median(scores)),
            "min": float(scores.min()), "max": float(scores.max()),
        },
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    note(f"best {out['best_score']:.4f} vs median "
         f"{rec['candidate_score_stats']['median']:.4f} ({wall:.1f}s)")
    note(f"-> {args.out}")


if __name__ == "__main__":
    main()
