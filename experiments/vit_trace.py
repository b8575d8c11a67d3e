"""Trace the ViT train step on-chip and break down where the backward goes.

Context (docs/results/vit_mfu.json): the ViT-S/2 forward runs at ~54% MFU
scan-amortised, but the full train step only hits 16-24% — far below the
UNet's trace-defended 45%. This captures a jax.profiler trace of the
as-trained step (dropout 0.1) and the DiT-style no-dropout step, parses
per-HLO-category device self-time with xprof, and writes the evidence.

Usage: python experiments/vit_trace.py [--batch 256]
Writes: docs/results/mfu_vit_train.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def note(m):
    print(f"[vit-trace] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--trace-root", default="/tmp/itsd_trace_vit")
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from experiments.profile_mfu import (capture_trace, cost_analysis,
                                         parse_op_stats, summarize_hlo_stats)
    from experiments.vit_shapes import VIT, TRAIN_T, build_vit
    from itsd_tpu.core import linear_schedule
    from itsd_tpu.models import ViT, ViTConfig
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer, make_train_step)

    sched = linear_schedule(1e-4, 0.02, TRAIN_T)
    B = args.batch
    img = VIT["img"]
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, img, img, 3))
    out = {"batch": B, "model": dict(VIT)}

    def trace_one(model, tag):
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, img, img, 3)),
                            jnp.zeros((2,), jnp.int32))
        tx = make_optimizer(OptimizerConfig(lr=2e-4, epochs=4,
                                            steps_per_epoch=32,
                                            ema_decay=0.999))
        state = create_train_state(params, tx, ema=True)
        step = jax.jit(make_train_step(
            lambda p, *aa, **kw: model.apply(p, *aa, **kw), sched, tx,
            ema_decay=0.999, donate=False))
        holder = {"s": state}

        def run(batch_d, key):
            holder["s"], m = step(holder["s"], batch_d, key)
            return m["loss"]

        d = capture_trace(f"vit_{tag}", run,
                          ({"image": x0}, jax.random.PRNGKey(3)),
                          args.trace_root, reps=3)
        stats = parse_op_stats(d)
        rec = {"cost": cost_analysis(
            step.lower(holder["s"], {"image": x0},
                       jax.random.PRNGKey(3)).compile())}
        hs = stats.get("hlo_stats")
        if hs and os.path.exists(str(hs)):
            s = summarize_hlo_stats(hs)
            rec["total_self_ms_3reps"] = round(s["total_self_ms"], 2)
            rec["categories_pct"] = [
                [c, round(us / 1e3, 2), round(p, 1)]
                for c, us, p in s["categories"][:12]]
            rec["top_ops"] = s["top_ops"]
        note(f"{tag}: {rec.get('categories_pct')}")
        return rec

    out["dropout0.1_as_trained"] = trace_one(build_vit(), "drop01")
    cfg0 = ViTConfig(img_size=img, patch_size=VIT["patch_size"],
                     embed_dim=VIT["embed_dim"], depth=VIT["depth"],
                     num_heads=VIT["num_heads"], mlp_ratio=VIT["mlp_ratio"],
                     dropout=0.0, attention_impl="auto", dtype="bfloat16")
    out["dropout0.0_dit_style"] = trace_one(ViT(cfg0), "drop00")

    path = os.path.join(REPO, "docs", "results", "mfu_vit_train.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    note(f"-> {path}")


if __name__ == "__main__":
    main()
