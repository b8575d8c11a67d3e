"""BASELINE.md workload 5 measured: 64x64 conditional DDPM, extended T=3000
(functional time embedding — no surgery needed), best-of-64 random search,
CFG w=1.8, driven through the PRODUCT path (`cli.runner.run_search`, the
same jitted end-to-end program the `search` CLI runs).

Two modes (--model):
  artifact (default) — the TRAINED 64x64 conditional model committed in
      artifacts/shapes64_cond, scored by the trained SmallCNN classifier
      verifier: `best_score` is a REAL search result (mean target-class
      log-probability), and the winner grid is written. The T=3000 CFG
      chain runs with diffusion.clip_denoised=true (the per-step x0-hat
      clip that bounds long extrapolative-guidance chains,
      core/process.p_sample_step).
  imagenet-scale — the ImageNet-scale config (ch=128, 1000 labels) at
      random init: a pure throughput probe (weight-value independent);
      best_score is reported null by construction.

Single-chip measurement; the candidate axis shards over a mesh when more
devices are present (same code path proven on the 8-device virtual mesh in
tests/test_sharded_search.py and in __graft_entry__.dryrun_multichip).

Usage: python experiments/workload5_imagenet64.py [--candidates 64] [--t 3000]
Writes: docs/results/workload5_imagenet64.json
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
    ap.add_argument("--candidates", type=int, default=64)
    ap.add_argument("--t", type=int, default=3000)
    ap.add_argument("--per-candidate-batch", type=int, default=1)
    ap.add_argument("--chunk", type=int, default=8,
                    help="candidates per device launch (bounds per-launch "
                         "runtime; one 64xT=3000 launch trips the TPU "
                         "worker watchdog)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sampler", default="ddpm",
                    choices=["ddpm", "ddim", "dpm"],
                    help="candidate denoiser; dpm-N turns the T=3000 "
                         "chain into N solver steps (see docs/RESULTS.md "
                         "Axis 3 for why that wins at fixed budget)")
    ap.add_argument("--solver-steps", type=int, default=20)
    ap.add_argument("--model", default="artifact",
                    choices=["artifact", "imagenet-scale"],
                    help="artifact = trained shapes64_cond + classifier "
                         "verifier (real best_score); imagenet-scale = "
                         "ch128/1000-label random-init throughput probe")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "results", "workload5_imagenet64.json"))
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from itsd_tpu.cli.runner import build_model, run_search
    from itsd_tpu.utils.config import load_config

    def note(m):
        print(f"[w5] {m}", file=sys.stderr, flush=True)

    overrides = [
        f"search.n_candidates={args.candidates}",
        f"search.candidate_chunk={args.chunk}",
        f"inference_T={args.t}",
        f"train.eval_batch_size={args.per_candidate_batch}",
        f"diffusion.sampler={args.sampler}",
        f"diffusion.ddim_steps={args.solver_steps}",
    ]
    artifact_dir = os.path.join(REPO, "artifacts")
    use_artifact = (args.model == "artifact"
                    and os.path.isdir(os.path.join(artifact_dir,
                                                   "shapes64_cond")))
    if args.model == "artifact" and not use_artifact:
        note("artifacts/shapes64_cond missing — falling back to the "
             "imagenet-scale random-init throughput probe")

    if use_artifact:
        import experiments.train_artifacts as ta
        a = ta.ARCHS["shapes64_cond"]
        overrides += [
            f"model.channel={a['ch']}",
            f"model.channel_mult={list(a['ch_mult'])}",
            f"model.num_res_blocks={a['num_res_blocks']}",
            f"model.dropout={a['dropout']}",
            f"model.num_labels={a['num_labels']}",
            "search.verifier=classifier",
            "search.classifier_ckpt=" + os.path.join(
                artifact_dir, "classifier_shapes64"),
            # bounds the T=3000 extrapolative-CFG chain (the round-2
            # bf16-overflow failure mode); regression-tested in
            # tests/test_round3_fixes.py
            "diffusion.clip_denoised=true",
        ]
    cfg = load_config(
        os.path.join(REPO, "configs", "imagenet64_cond_search.yaml"),
        overrides=overrides)

    model, conditional = build_model(cfg)
    assert conditional
    t0 = time.perf_counter()
    if use_artifact:
        from itsd_tpu.train.checkpoint import restore_params
        params = restore_params(os.path.join(artifact_dir, "shapes64_cond"))
        params = jax.tree.map(
            lambda p: jnp.asarray(p, jnp.float32)
            if getattr(p, "dtype", None) == jnp.bfloat16 else jnp.asarray(p),
            params)
        weights_desc = ("trained EMA (artifacts/shapes64_cond, shapes64 "
                        "dataset)")
        verifier_desc = ("trained SmallCNN classifier "
                        "(artifacts/classifier_shapes64): mean target-class "
                        "log-prob")
        note(f"loaded trained 64x64 conditional UNet "
             f"({cfg.model.num_labels} labels, ch={cfg.model.channel})")
    else:
        x = jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3),
                      jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        lab = jnp.zeros((1,), jnp.int32)
        note(f"init ImageNet-64 conditional UNet ({cfg.model.num_labels} "
             "labels, bf16) ...")
        params = model.init(jax.random.PRNGKey(0), x, t, lab)
        jax.block_until_ready(params)
        weights_desc = "random-init (throughput probe)"
        verifier_desc = "self_supervised heuristic"
    note(f"setup {time.perf_counter() - t0:.0f}s; running search "
         f"(N={args.candidates}, T={args.t}, CFG w={cfg.diffusion.w}, "
         f"batch/candidate={args.per_candidate_batch}) ...")

    # 1) Product path once: the search CLI's own program (writes the grid
    #    artifact). Includes trace+compile on this 1-CPU host.
    t0 = time.perf_counter()
    res = run_search(cfg, params=params)
    first = time.perf_counter() - t0
    note(f"product-path run (incl trace+compile): {first:.1f}s, "
         f"best_score={res['best_score']:.4f}")

    # 2) Steady-state device rate: the identical jitted program (same
    #    library calls run_search makes), compiled once, timed hot.
    from itsd_tpu.cli.runner import build_schedule, make_eps_fn
    from itsd_tpu.core import sample
    from itsd_tpu.search import random_search, self_supervised_verifier

    sched = build_schedule(cfg, inference=True)
    bs = cfg.train.eval_batch_size
    labels = (jnp.arange(bs) % cfg.model.num_labels) + 1
    eps_fn = make_eps_fn(model, params, True, labels, cfg.diffusion.w)
    from itsd_tpu.cli.runner import run_sampler
    denoise_fn = lambda noise, k: run_sampler(cfg, sched, eps_fn, noise, k)
    shape = (bs, cfg.data.img_size, cfg.data.img_size, 3)
    verifier = self_supervised_verifier()

    chunk = min(args.chunk, args.candidates)
    assert args.candidates % chunk == 0, (args.candidates, chunk)
    n_chunks = args.candidates // chunk

    @jax.jit
    def program(k):
        r = random_search(k, shape, denoise_fn, verifier,
                          n_candidates=chunk, return_images=False)
        return r.best_noise, r.best_score

    times = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        for ci in range(n_chunks):
            out = program(jax.random.PRNGKey(100 + i * n_chunks + ci))
            jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        note(f"steady rep {i} ({n_chunks} chunks x {chunk}): "
             f"{times[-1]:.1f}s" + (" (incl compile)" if i == 0 else ""))
    best = min(times[1:]) if len(times) > 1 else times[0]
    evals_per_cand = (args.t if args.sampler == "ddpm"
                      else min(args.solver_steps, args.t))
    nfe_model_evals = args.candidates * evals_per_cand * 2  # CFG: 2/step
    imgs = args.candidates * args.per_candidate_batch
    if args.sampler != "ddpm" and args.out.endswith(".json"):
        args.out = args.out.replace(
            ".json", f"_{args.sampler}{args.solver_steps}.json")
    if not use_artifact and args.out.endswith(".json"):
        args.out = args.out.replace(".json", "_imagenet_scale.json")
    best_score = (float(res["best_score"])
                  if res and np.isfinite(res["best_score"]) else None)
    if use_artifact:
        assert best_score is not None, (
            "artifact-mode search must produce a finite score "
            "(clip_denoised bounds the chain)")
        # commit the winner grid next to the result
        import shutil
        src = os.path.join(cfg.sampled_dir, "search_random_best.png")
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(
                REPO, "docs", "results", "workload5_winner.png"))
        scores = np.asarray(res["result"].history["scores"]).ravel()
        score_stats = {"median": float(np.median(scores)),
                       "min": float(np.min(scores)),
                       "max": float(np.max(scores))}
    else:
        score_stats = None
    report = {
        "workload": "BASELINE.md #5: 64x64 cond DDPM, extended "
                    f"T={args.t}, best-of-{args.candidates} random search, "
                    f"CFG w={cfg.diffusion.w}",
        "model": (f"ch={cfg.model.channel} mult={cfg.model.channel_mult} "
                  f"labels={cfg.model.num_labels}"),
        "weights": weights_desc,
        "verifier": verifier_desc,
        "clip_denoised": cfg.diffusion.clip_denoised,
        "sampler": args.sampler,
        "evals_per_candidate": evals_per_cand * 2,
        "device": str(jax.devices()[0]),
        "n_devices": len(jax.devices()),
        "product_path_wall_s_incl_compile": first,
        "steady_wall_s": best,
        "candidates_per_s": args.candidates / best,
        "images_denoised_per_s": imgs / best,
        "model_evals_per_s": nfe_model_evals / best,
        "best_score": best_score,
        "candidate_score_stats": score_stats,
        "all_s": times,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
