"""Min-SNR loss-weighting A/B: does `train.loss_weighting=min_snr`
(Hang et al. 2023, arXiv 2303.09556) buy sample quality per training step
over the reference's uniform MSE (`/root/reference/Diffusion/Diffusion.py:46`)?

Protocol: two arms (none vs min_snr gamma=5) trained on the SAME data,
SAME init, SAME batch-index stream and SAME per-step rng keys — the loss
weight is the only difference. Every `--eval-every` steps each arm's EMA
params sample `--eval-n` images via DDIM-50 from a SHARED noise key, and
the pooled-pixel FID-proxy vs held-out reals is recorded. Training-loss
values are logged but NOT comparable across arms (the weighting rescales
the objective); the comparison metric is the proxy trajectory.

Output: docs/results/min_snr_ab.json
Smoke: python experiments/min_snr_ab.py --smoke   (tiny, CPU-safe)
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "results")


def note(m):
    print(f"[min_snr_ab] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--eval-n", type=int, default=64)
    ap.add_argument("--gamma", type=float, default=5.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--out", default=os.path.join(OUT, "min_snr_ab.json"))
    args = ap.parse_args()

    if args.smoke:
        os.environ.setdefault("ITSD_PLATFORM", "cpu")
        args.steps, args.batch = 60, 16
        args.eval_every, args.eval_n = 30, 8

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from itsd_tpu.core import linear_schedule
    from itsd_tpu.core.sampling import ddim_sample
    from itsd_tpu.data import shapes_dataset
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.search.verifiers import make_fid_proxy
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer, make_train_step)
    from itsd_tpu.utils import chunked_device_put

    img = 16 if args.smoke else 32
    cfg = (uncond_unet_config(ch=16, ch_mult=(1,), attn=(),
                              num_res_blocks=1, dropout=0.0) if args.smoke
           else uncond_unet_config(ch=64, ch_mult=(1, 2, 2), attn=(1,),
                                   num_res_blocks=2, dropout=0.1))
    T = 100 if args.smoke else 1000
    sched = linear_schedule(1e-4, 0.02, T)
    model = UNet(cfg)

    n_data = 1024 if args.smoke else 4096
    images, _ = shapes_dataset(n=n_data, img_size=img, num_labels=10,
                               seed=args.seed)
    fid_proxy = make_fid_proxy(jnp.asarray(images[-512:]))
    xs = chunked_device_put(images)

    x0 = jnp.zeros((2, img, img, 3), jnp.float32)
    t0 = jnp.zeros((2,), jnp.int32)
    params0 = model.init(jax.random.PRNGKey(args.seed), x0, t0)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params0))
    note(f"{n_params/1e6:.2f}M params, {len(images)} imgs, "
         f"{args.steps} steps @ batch {args.batch}, T={T}")

    # Shared streams: identical batches + step keys for both arms.
    rng = np.random.default_rng(args.seed)
    idx = rng.integers(0, len(images),
                       size=(args.steps, args.batch)).astype(np.int32)
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(args.seed + 1),
        jnp.arange(args.steps, dtype=jnp.uint32))
    eval_key = jax.random.PRNGKey(args.seed + 2)

    def run_arm(weighting: str):
        tx = make_optimizer(OptimizerConfig(
            lr=2e-4, epochs=10, steps_per_epoch=max(args.steps // 10, 1),
            ema_decay=0.999))
        # fresh buffers per arm — fit_chunk donates its carry, and the two
        # arms must start from the SAME init values, not the same buffers
        state = create_train_state(jax.tree.map(jnp.copy, params0), tx,
                                   ema=True)
        step_fn = make_train_step(
            lambda p, *a, **kw: model.apply(p, *a, **kw), sched, tx,
            loss_weighting=weighting, snr_gamma=args.gamma,
            ema_decay=0.999, donate=False)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fit_chunk(state, idx_chunk, keys_chunk):
            def body(st, inp):
                bidx, skey = inp
                st, m = step_fn(st, {"image": jnp.take(xs, bidx, axis=0)},
                                skey)
                return st, m["loss"]
            return lax.scan(body, state, (idx_chunk, keys_chunk))

        @jax.jit
        def sample_ema(ema, key):
            def eps_fn(x, tb):
                return model.apply(ema, x, tb, deterministic=True)
            x_T = jax.random.normal(key, (args.eval_n, img, img, 3))
            return ddim_sample(sched, eps_fn, x_T, key,
                               num_steps=min(50, T))

        history = []
        done = 0
        t_start = time.time()
        while done < args.steps:
            n_now = min(args.eval_every, args.steps - done)
            state, losses = fit_chunk(state, jnp.asarray(idx[done:done + n_now]),
                                      keys[done:done + n_now])
            done += n_now
            proxy = fid_proxy(sample_ema(state.ema_params, eval_key))
            proxy_raw = fid_proxy(sample_ema(state.params, eval_key))
            history.append({"step": done,
                            "loss_mean": float(losses.mean()),
                            "fid_proxy": proxy,
                            "fid_proxy_raw_params": proxy_raw})
            note(f"  {weighting}: step {done} loss {float(losses.mean()):.4f} "
                 f"proxy {proxy:.3f} raw {proxy_raw:.3f} "
                 f"({done/(time.time()-t_start):.1f} st/s)")
        return history

    result = {
        "workload": ("min-SNR-gamma loss weighting A/B: shapes dataset, "
                     "identical init/data/rng across arms; DDIM-50 EMA "
                     "samples scored by pooled-pixel FID-proxy vs held-out "
                     "reals (lower is better)"),
        "backend": jax.devices()[0].platform,
        "img_size": img, "T": T, "steps": args.steps, "batch": args.batch,
        "snr_gamma": args.gamma, "eval_n": args.eval_n, "seed": args.seed,
        "note": ("loss_mean is NOT comparable across arms — min_snr "
                 "rescales the objective; compare fid_proxy at equal step"),
        "arms": {},
    }
    for arm in ("none", "min_snr"):
        note(f"arm: {arm}")
        result["arms"][arm] = run_arm(arm)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    note(f"wrote {args.out}")
    final = {a: h[-1]["fid_proxy"] for a, h in result["arms"].items()}
    note(f"final fid_proxy: {final}")


if __name__ == "__main__":
    main()
