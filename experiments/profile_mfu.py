"""Trace-derived MFU / bottleneck analysis for the bench workloads (VERDICT
round-1 item 7: "back the MFU story with data").

Captures a jax.profiler trace of (a) the T-step ancestral sampler and (b) the
SPMD train step on the real chip, parses the xplane with xprof's converters,
and emits a per-op-category time breakdown plus a cost-analysis roofline
(FLOPs and HBM bytes from XLA's own cost model vs. the chip's peaks).

Usage:  python experiments/profile_mfu.py [--t 50] [--batch 8]
Writes: docs/results/mfu_profile.json (+ per-op CSVs next to it)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# v5e (TPU v5 lite) single-chip peaks — public numbers:
# 197 TFLOP/s bf16, 819 GB/s HBM BW.
PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_GBS = 819e9


def build_sampler(batch, T, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    from itsd_tpu.core import linear_schedule, sample
    from itsd_tpu.models import UNet, uncond_unet_config

    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 2, 2), attn=(1,),
                             num_res_blocks=2, dropout=0.1, dtype=dtype)
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, T)
    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    eps_fn = lambda xx, tt: model.apply(params, xx, tt)
    run = jax.jit(lambda noise, key: sample(sched, eps_fn, noise, key))
    noise = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    step = jax.jit(eps_fn)
    return run, (noise, jax.random.PRNGKey(1)), step, (x, t)


def build_train_step(batch, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp
    from itsd_tpu.core import linear_schedule
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.train.loop import create_train_state, make_train_step
    import optax

    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 2, 2), attn=(1,),
                             num_res_blocks=2, dropout=0.1, dtype=dtype)
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, 1000)
    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(2e-4, weight_decay=1e-4))
    state = create_train_state(params, tx)
    step = make_train_step(model.apply, sched, tx)  # jitted, donates state
    batch_x = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    return step, state, batch_x


def cost_analysis(compiled) -> dict:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return {k: ca.get(k) for k in
                ("flops", "bytes accessed", "transcendentals")
                if k in ca}
    except Exception as e:  # pragma: no cover
        return {"error": str(e)}


def capture_trace(tag, fn, args, trace_root, reps=3):
    """Run fn(args) a few times under jax.profiler; return trace dir."""
    import jax
    d = os.path.join(trace_root, tag)
    os.makedirs(d, exist_ok=True)
    # warm up / compile outside the trace
    out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.start_trace(d)
    try:
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
    finally:
        jax.profiler.stop_trace()
    return d


def parse_op_stats(trace_dir) -> dict:
    """Per-op-category device-time breakdown out of the xplane via xprof."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        return {"error": f"no xplane.pb under {trace_dir}"}
    from xprof.convert import raw_to_tool_data as rtd
    try:
        names = rtd.xspace_to_tool_names(paths)
    except Exception as e:
        names = []
        print(f"[profile] tool-name listing failed: {e}", file=sys.stderr)
    out = {"xplane": paths[-1], "tools": list(names)}
    for tool in ("framework_op_stats", "hlo_stats", "op_profile"):
        try:
            data, _ctype = rtd.xspace_to_tool_data(paths, tool, {})
            fn = os.path.join(trace_dir, f"{tool}.out")
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(fn, mode) as f:
                f.write(data)
            out[tool] = fn
        except Exception as e:
            out[tool] = f"error: {e}"
    return out


def summarize_hlo_stats(path) -> dict:
    """xprof hlo_stats (gviz JSON) -> per-HLO-category device self-time.

    Returns {"categories": [(category, total_self_us, pct)...] desc,
             "total_self_ms": float, "top_ops": [...]}.
    """
    with open(path) as f:
        d = json.load(f)
    cols = [c["id"] for c in d["cols"]]
    ci = {c: i for i, c in enumerate(cols)}
    agg = {}
    total = 0.0
    rows = d.get("rows", [])
    for r in rows:
        c = r["c"]
        cat = c[ci["category"]]["v"]
        t = float(c[ci["total_self_time"]]["v"])
        agg[cat] = agg.get(cat, 0.0) + t
        total += t
    cats = sorted(((k, v, 100.0 * v / (total or 1.0))
                   for k, v in agg.items()), key=lambda kv: -kv[1])
    rows = sorted(rows, key=lambda r: -float(
        r["c"][ci["total_self_time"]]["v"]))
    top = []
    for r in rows[:10]:
        c = r["c"]
        g = lambda k: c[ci[k]]["v"]
        top.append({
            "op": g("hlo_op_name"), "category": g("category"),
            "self_us": float(g("total_self_time")),
            "model_flop_rate": g("model_flop_rate"),
            "operational_intensity": g("operational_intensity"),
            "bound_by": g("bound_by"),
        })
    return {"categories": cats, "total_self_ms": total / 1e3,
            "top_ops": top}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train-batch", type=int, default=128)
    ap.add_argument("--only", choices=("all", "sampler", "train"),
                    default="all")
    ap.add_argument("--trace-root", default="/tmp/itsd_trace")
    ap.add_argument("--out", default=os.path.join(
        REPO, "docs", "results", "mfu_profile.json"))
    args = ap.parse_args()

    import jax
    dev = jax.devices()[0]
    report = {"device": str(dev), "T": args.t, "batch": args.batch,
              "train_batch": args.train_batch}

    def note(msg):
        print(f"[profile] {msg}", file=sys.stderr, flush=True)

    if args.only in ("all", "sampler"):
        # ---- sampler ----
        note(f"building T={args.t} sampler (includes model.init on device, "
             "~2.5 min on this 1-CPU host) ...")
        run, sargs, eps_step, eargs = build_sampler(args.batch, args.t)
        # Per-UNet-forward cost from XLA's own model (the scan's
        # cost_analysis counts the body ONCE, so whole-run flops must be
        # flops_per_step * T).
        note("compiling single eps step for cost analysis ...")
        ca_step = cost_analysis(eps_step.lower(*eargs).compile())
        note(f"per-step cost: {ca_step}")
        t0 = time.perf_counter()
        jax.block_until_ready(run(*sargs))
        compile_s = time.perf_counter() - t0
        note(f"sampler traced+compiled+ran in {compile_s:.1f}s")
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(*sargs))
            times.append(time.perf_counter() - t0)
        best = min(times)
        note(f"sampler steady-state {best:.3f}s")
        samp = {"wall_s": best, "all_s": times, "first_s": compile_s,
                "per_step_cost_analysis": ca_step}
        if "flops" in ca_step:
            total_flops = ca_step["flops"] * args.t
            samp["total_flops"] = total_flops
            samp["model_flops_util"] = total_flops / best / PEAK_FLOPS_BF16
            samp["hbm_bytes_per_step"] = ca_step.get("bytes accessed", 0)
            samp["hbm_util"] = (ca_step.get("bytes accessed", 0) * args.t
                                / best / PEAK_HBM_GBS)
        report["sampler"] = samp
        trace = capture_trace("sampler", run, sargs, args.trace_root)
        note("sampler trace captured; parsing ...")
        report["sampler_trace"] = parse_op_stats(trace)

    if args.only in ("all", "train"):
        # ---- train step ----
        note(f"building train step (batch={args.train_batch}), compiling ...")
        step, state, bx = build_train_step(args.train_batch)
        key = jax.random.PRNGKey(9)
        batch = {"image": bx}
        try:
            ca2 = cost_analysis(step.lower(state, batch, key).compile())
        except Exception as e:
            ca2 = {"error": str(e)}
        t0 = time.perf_counter()
        st, _ = step(state, batch, key)          # compile (donates state)
        jax.block_until_ready(st)
        note(f"train step first call {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            st, m = step(st, batch, key)
            jax.block_until_ready(m)
            times.append(time.perf_counter() - t0)
        best = min(times)
        note(f"train steady-state {best * 1e3:.1f}ms")
        tr = {"wall_s": best, "all_s": times, "cost_analysis": ca2}
        if "flops" in ca2:
            tr["model_flops_util"] = ca2["flops"] / best / PEAK_FLOPS_BF16
            tr["hbm_util"] = (ca2.get("bytes accessed", 0) / best
                              / PEAK_HBM_GBS)
            tr["img_per_s"] = args.train_batch / best
        report["train_step"] = tr

        def traced_step():
            nonlocal st
            st, m = step(st, batch, key)
            return m
        trace = capture_trace("train", lambda: traced_step(), (),
                              args.trace_root)
        note("train trace captured; parsing ...")
        report["train_trace"] = parse_op_stats(trace)

    # summarize per-category device time out of each trace's hlo_stats
    for tag in ("sampler", "train"):
        p = report.get(f"{tag}_trace", {}).get("hlo_stats")
        if p and os.path.exists(str(p)):
            try:
                report[f"{tag}_hlo"] = summarize_hlo_stats(p)
            except Exception as e:
                report[f"{tag}_hlo"] = {"error": str(e)}
        opp = report.get(f"{tag}_trace", {}).get("op_profile")
        if opp and os.path.exists(str(opp)):
            try:
                with open(opp) as f:
                    m = json.load(f)["byProgram"]["metrics"]
                report[f"{tag}_device"] = {
                    "busy_flops_util": m.get("flops"),
                    "busy_time_ms": m.get("rawTime", 0) / 1e9,
                    "raw_flops": m.get("rawFlops"),
                    "hbm_bw_utils": m.get("bandwidthUtils"),
                }
            except Exception as e:
                report[f"{tag}_device"] = {"error": str(e)}

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1, default=str)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("_trace")}, indent=1, default=str))
    print(f"[profile] full report -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
