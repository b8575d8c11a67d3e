"""Sample a grid from a committed artifact checkpoint (artifacts/<name>).

Rebuilds the exact module from train_artifacts.ARCHS, loads the bf16 EMA
weights, and ancestrally samples a 16-image grid — in watchdog-safe
250-step segment launches for big images. Writes
docs/results/artifact_<name>_sampled.png.

Usage: python experiments/sample_artifact.py --name shapes256_uncond
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="shapes256_uncond")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--seg", type=int, default=250)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import experiments.train_artifacts as ta
    from itsd_tpu.core import denoise_segment, linear_schedule, make_cfg_eps_fn
    from itsd_tpu.train.checkpoint import restore_params
    from itsd_tpu.utils import save_image_grid

    a = ta.ARCHS[args.name]
    model, conditional = ta.build_unet(args.name)
    params = restore_params(os.path.join(ta.ARTIFACTS, args.name))
    params = jax.tree.map(lambda p: jnp.asarray(
        p, jnp.float32) if p.dtype == jnp.bfloat16 else p, params)
    sched = linear_schedule(1e-4, 0.02, ta.TRAIN_T)
    if conditional:
        lab = (jnp.arange(args.n) % a["num_labels"]) + 1
        eps_fn = make_cfg_eps_fn(
            lambda xx, tt, ll: model.apply(params, xx, tt, ll), lab, 1.8)
    else:
        eps_fn = lambda xx, tt: model.apply(params, xx, tt)

    x = jax.random.normal(jax.random.PRNGKey(args.seed),
                          (args.n, a["img"], a["img"], 3))
    t0 = time.time()
    for hi in range(ta.TRAIN_T, 0, -args.seg):
        lo = max(0, hi - args.seg)
        x = jax.jit(lambda xx, kk, h=hi, l=lo: denoise_segment(
            sched, eps_fn, xx, kk, h, l))(
                x, jax.random.PRNGKey(800 + hi))
        x.block_until_ready()
        print(f"[sample] t {hi} -> {lo} ({time.time()-t0:.1f}s)",
              file=sys.stderr, flush=True)
    out = os.path.join(REPO, "docs", "results",
                       f"artifact_{args.name}_sampled.png")
    save_image_grid(np.asarray(x), out, nrow=4)
    print(f"[sample] grid -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
