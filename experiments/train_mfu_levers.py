"""Train-step MFU levers (VERDICT r2 #6: push train MFU toward the
sampler's 58% or defend the ceiling).

A/B sweep on the real chip over the plausible levers:
  * batch size (128 -> 1024): amortises the fixed vector-unit tail
  * optimizer moment dtype (f32 vs bf16 mu/nu): halves Adam-state HBM
    traffic in the update fusion
  * EMA on/off: the EMA axpy is pure HBM traffic over every param

MFU = XLA-cost-model FLOPs / wall / 197 TFLOP/s (same accounting as
docs/PERF.md). Writes docs/results/train_mfu_levers.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK = 197e12


def measure(batch, mu_dtype, ema, reps=5):
    import jax
    import jax.numpy as jnp
    import optax

    from itsd_tpu.core import linear_schedule
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.train.loop import create_train_state, make_train_step

    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 2, 2), attn=(1,),
                             num_res_blocks=2, dropout=0.1, dtype="bfloat16")
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, 1000)
    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((batch,), jnp.int32))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(2e-4, weight_decay=1e-4,
                    mu_dtype=jnp.bfloat16 if mu_dtype == "bf16" else None))
    state = create_train_state(params, tx, ema=ema)
    step = make_train_step(model.apply, sched, tx,
                           ema_decay=0.999 if ema else None)
    batch_d = {"image": jax.random.normal(jax.random.PRNGKey(3), x.shape)}
    key = jax.random.PRNGKey(9)
    flops = None
    try:
        ca = step.lower(state, batch_d, key).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    st, m = step(state, batch_d, key)
    jax.block_until_ready(m)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        st, m = step(st, batch_d, key)
        jax.block_until_ready(m)
        times.append(time.perf_counter() - t0)
    best = min(times)
    row = {"batch": batch, "mu_dtype": mu_dtype, "ema": ema,
           "ms_per_step": round(best * 1e3, 2),
           "img_per_s": round(batch / best, 1),
           "mfu": round(flops / best / PEAK, 4) if flops else None}
    print(f"[levers] {row}", file=sys.stderr, flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "results", "train_mfu_levers.json"))
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax

    rows = []
    for batch, mu, ema in ((128, "f32", True), (256, "f32", True),
                           (512, "f32", True), (512, "bf16", True),
                           (512, "bf16", False), (1024, "bf16", True)):
        try:
            rows.append(measure(batch, mu, ema))
        except Exception as e:
            rows.append({"batch": batch, "mu_dtype": mu, "ema": ema,
                         "error": f"{type(e).__name__}: {e}"})
    report = {"device": str(jax.devices()[0]), "rows": rows,
              "accounting": "XLA cost-model FLOPs / wall / 197e12"}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
