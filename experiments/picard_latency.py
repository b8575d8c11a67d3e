"""Parallel-in-time (Picard) sampling wall-clock vs sequential DDIM.

The win condition is LATENCY-bound serving: small batch, where the chip is
far from FLOPs-saturated, so folding the whole time grid into one batched
eval costs much less than grid-length x per-step latency. Measures, for a
CIFAR-scale UNet on one chip: sequential DDIM-n (one jitted lax.scan) vs
Picard (one jitted lax.while_loop of grid-folded sweeps), the sweeps the
iteration actually needed (tol 1e-3), and the speedup.

Writes docs/results/picard_latency.json.
Usage: python experiments/picard_latency.py [--ch 64] [--img 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from itsd_tpu.core import (ddim_sample, linear_schedule,
                           parallel_picard_sample)
from itsd_tpu.models import UNet, uncond_unet_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ch", type=int, default=64)
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--T", type=int, default=1000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "results", "picard_latency.json"))
    args = ap.parse_args()

    cfg = uncond_unet_config(ch=args.ch, ch_mult=(1, 2, 2), attn=(1,),
                             num_res_blocks=2, dropout=0.0,
                             dtype="bfloat16")
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, args.T)
    x = jnp.zeros((1, args.img, args.img, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
    eps_fn = lambda xx, tt: model.apply(params, xx, tt)

    rows = []
    for B in (1, 4):
        for n in (32, 64):
            noise = jax.random.normal(jax.random.PRNGKey(1),
                                      (B, args.img, args.img, 3))
            seq = jax.jit(lambda z, k, _n=n: ddim_sample(
                sched, eps_fn, z, k, num_steps=_n))
            par = jax.jit(lambda z, k, _n=n: parallel_picard_sample(
                sched, eps_fn, z, k, num_steps=_n, tol=1e-3))

            def best_of(f):
                out = f(noise, jax.random.PRNGKey(2))
                jax.block_until_ready(out)
                ts = []
                for i in range(args.reps):
                    t0 = time.perf_counter()
                    out = f(noise, jax.random.PRNGKey(3 + i))
                    jax.block_until_ready(out)
                    ts.append(time.perf_counter() - t0)
                return min(ts), out

            t_seq, x_seq = best_of(seq)
            t_par, (x_par, iters) = best_of(par)
            err = float(jnp.abs(x_par - x_seq).max())
            row = {"batch": B, "grid_n": n,
                   "seq_ddim_ms": round(t_seq * 1e3, 2),
                   "picard_ms": round(t_par * 1e3, 2),
                   "picard_sweeps": int(iters),
                   "speedup": round(t_seq / t_par, 2),
                   "max_abs_diff_vs_seq": round(err, 5)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    report = {"model": f"UNet ch={args.ch} (1,2,2) attn@16 "
                       f"{args.img}x{args.img} bf16",
              "T": args.T, "device": str(jax.devices()[0]), "rows": rows}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
