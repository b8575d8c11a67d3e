"""Benchmark: images/sec/chip for CIFAR-10-scale DDPM ancestral sampling at
fixed NFE (BASELINE.md workload 1: 32x32, T=1000, UNet ch=128 (1,2,2,2)
attn@16x16, batch 8), plus structured measurements for BASELINE.md
workloads 2-4 in the detail blob:
  cfg              — CFG sampling w=1.8, dual-batched guidance (workload 2)
  search           — best-of-16 random search throughput (workload 3)
  ensemble_search  — zero-order + path search with the on-device FID/IS
                     ensemble verifier (workload 4)
Set BENCH_FAST=1 to run only the primary workload.

Prints ONE JSON line:
  {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s",
   "vs_baseline": N, ...}

Baseline = the PyTorch reference sampler on CPU (the hardware it actually
ships with here). Measured live from /root/reference when importable (a few
steps, extrapolated to full T), else read from bench_baseline.json
(committed, measured on this machine).
"""

import json
import os
import sys
import time

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
T = int(os.environ.get("BENCH_T", "1000"))
IMG = 32
REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_ours() -> dict:
    import jax
    import jax.numpy as jnp
    from itsd_tpu.core import linear_schedule, sample
    from itsd_tpu.models import UNet, uncond_unet_config

    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    attn_impl = os.environ.get("BENCH_ATTN", "auto")
    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 2, 2), attn=(1,),
                             num_res_blocks=2, dropout=0.1, dtype=dtype,
                             attention_impl=attn_impl)
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, T)
    x = jnp.zeros((BATCH, IMG, IMG, 3), jnp.float32)
    t = jnp.zeros((BATCH,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)

    eps_fn = lambda xx, tt: model.apply(params, xx, tt)
    run = jax.jit(lambda noise, key: sample(sched, eps_fn, noise, key))

    key = jax.random.PRNGKey(1)
    noise = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    log(f"[ours] compiling T={T} sampler (batch={BATCH}, dtype={dtype}, "
        f"attn={attn_impl}) on {jax.devices()[0]} ...")
    t0 = time.perf_counter()
    out = run(noise, key)
    out.block_until_ready()
    compile_and_first = time.perf_counter() - t0
    log(f"[ours] first run (incl compile): {compile_and_first:.1f}s")

    reps = int(os.environ.get("BENCH_REPS", "3"))
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = run(noise, jax.random.PRNGKey(10 + i))
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    log(f"[ours] steady-state full-T times: {[f'{x:.3f}' for x in times]}")
    return {
        "images_per_sec": BATCH / best,
        "seconds_per_image": best / BATCH,
        "full_T_seconds": best,
        "dtype": dtype,
    }


def measure_torch_baseline() -> dict:
    """Reference UNet + per-step sampler math on CPU torch; a few steps
    timed and extrapolated to full T."""
    import importlib.util

    import torch

    # load Model.py directly: the Diffusion package __init__ pulls in
    # torchvision, which is not installed here
    spec = importlib.util.spec_from_file_location(
        "ref_model", "/root/reference/Diffusion/Model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    TorchUNet = mod.UNet

    torch.manual_seed(0)
    with torch.no_grad():
        net = TorchUNet(T=T, ch=128, ch_mult=[1, 2, 2, 2], attn=[1],
                        num_res_blocks=2, dropout=0.1).eval()
        x = torch.randn(BATCH, 3, IMG, IMG)
        tt = torch.full((BATCH,), T - 1, dtype=torch.long)
        # warmup
        net(x, tt)
        n_steps = int(os.environ.get("BENCH_TORCH_STEPS", "5"))
        t0 = time.perf_counter()
        for i in range(n_steps):
            eps = net(x, tt)
            x = x - 0.01 * eps  # per-step elementwise update (negligible)
        dt = (time.perf_counter() - t0) / n_steps
    return {
        "images_per_sec": BATCH / (dt * T),
        "seconds_per_step": dt,
        "extrapolated_full_T_seconds": dt * T,
        "hardware": "cpu",
    }


def get_baseline() -> dict:
    if os.environ.get("BENCH_SKIP_TORCH") != "1" and \
            os.path.isdir("/root/reference"):
        try:
            log("[baseline] measuring torch reference on CPU ...")
            b = measure_torch_baseline()
            log(f"[baseline] {b}")
            try:
                with open(BASELINE_CACHE, "w") as f:
                    json.dump(b, f, indent=2)
            except OSError:
                pass
            return b
        except Exception as e:  # pragma: no cover
            log(f"[baseline] live measurement failed: {e}")
    if os.path.isfile(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    return {"images_per_sec": None}


def measure_cfg() -> dict:
    """CFG sampling throughput (BASELINE.md workload 2): conditional UNet,
    guidance w=1.8 via the dual-batched CFG mix — 2 model evals per step
    folded into one forward (`DiffusionCondition.py:79-87` does them
    sequentially)."""
    import jax
    import jax.numpy as jnp
    from itsd_tpu.core import linear_schedule, make_cfg_eps_fn, sample
    from itsd_tpu.models import UNet, cond_unet_config

    cfg = cond_unet_config(num_labels=10, ch=128, ch_mult=(1, 2, 2, 2),
                           num_res_blocks=2, dropout=0.1, T=T,
                           dtype="bfloat16")
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, T)
    x = jnp.zeros((BATCH, IMG, IMG, 3), jnp.float32)
    labels = (jnp.arange(BATCH) % 10 + 1).astype(jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((BATCH,), jnp.int32), labels)
    eps_fn = make_cfg_eps_fn(
        lambda xx, tt, ll: model.apply(params, xx, tt, ll), labels, w=1.8)
    run = jax.jit(lambda noise, key: sample(sched, eps_fn, noise, key))
    noise = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    run(noise, jax.random.PRNGKey(1)).block_until_ready()  # compile
    times = []
    for i in range(2):
        t0 = time.perf_counter()
        run(noise, jax.random.PRNGKey(10 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {"images_per_sec": round(BATCH / best, 4),
            "full_T_seconds": round(best, 4), "w": 1.8,
            "nfe_per_image": 2 * T}


def measure_ensemble_search() -> dict:
    """Zero-order + path search with the FID/IS ensemble verifier
    (BASELINE.md workload 4): verifier = -FID(features vs real stats) +
    IS, all on-device inside the jitted search (random-weight Inception —
    documented proxy; ordering-discriminative, which is what search needs)."""
    import jax
    import jax.numpy as jnp
    from itsd_tpu.core import linear_schedule, sample
    from itsd_tpu.metrics import gaussian_stats
    from itsd_tpu.metrics.frechet import frechet_distance_jax
    from itsd_tpu.metrics.inception import (init_random_params, inception_v3,
                                            preprocess)
    from itsd_tpu.metrics.is_score import is_score_jax
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.search import path_search, zero_order_search

    t_search = int(os.environ.get("BENCH_SEARCH_T", "100"))
    b = 4
    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 2, 2), attn=(1,),
                             num_res_blocks=2, dropout=0.1, dtype="bfloat16")
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, t_search)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((b, IMG, IMG, 3)),
                        jnp.zeros((b,), jnp.int32))
    eps_fn = lambda xx, tt: model.apply(params, xx, tt)
    denoise = lambda n, k: sample(sched, eps_fn, n, k)

    inc = init_random_params(jax.random.PRNGKey(42))
    # Fréchet on a 256-d random projection of the 2048-d features: a
    # 2048x2048 eigh inside the vmapped search scan would dominate the
    # run; the projection preserves candidate ordering (Johnson-
    # Lindenstrauss), which is all a verifier needs.
    d = 256
    proj = jax.random.normal(jax.random.PRNGKey(7), (2048, d)) / (2048 ** 0.5)
    # "real" stats from smooth synthetic blobs (no dataset on this machine)
    from itsd_tpu.data import synthetic_dataset
    real, _ = synthetic_dataset(n=64, img_size=IMG)
    real_feats, _ = inception_v3(inc, preprocess(
        jnp.asarray((real + 1.0) / 2.0)))
    real_feats = real_feats @ proj
    mu_r = real_feats.mean(0)
    cov_r = jnp.cov(real_feats, rowvar=False) + 1e-4 * jnp.eye(d)

    def verifier(images):  # images [B,H,W,C] in [-1,1]
        unit = (images + 1.0) / 2.0
        feats, logits = inception_v3(inc, preprocess(unit))
        feats = feats @ proj
        mu_f = feats.mean(0)
        cov_f = (jnp.cov(feats, rowvar=False) + 1e-4 * jnp.eye(d))
        fid = frechet_distance_jax(mu_r, cov_r, mu_f, cov_f)
        is_v = is_score_jax(jax.nn.softmax(logits, axis=-1))
        return -fid + 10.0 * is_v

    out = {}
    k = jax.random.PRNGKey(3)
    init = jax.random.normal(jax.random.fold_in(k, 0), (b, IMG, IMG, 3))

    @jax.jit
    def run_zo(key, init):
        r = zero_order_search(key, init, denoise, verifier, n_neighbors=4,
                              n_iterations=2, neighbor_mode="shell")
        return r.best_score
    run_zo(k, init).block_until_ready()
    t0 = time.perf_counter()
    s = float(run_zo(jax.random.fold_in(k, 1), init))
    out["zero_order"] = {"wall_seconds": round(time.perf_counter() - t0, 3),
                         "best_score": s, "nfes": 8}

    @jax.jit
    def run_path(key):
        r = path_search(key, sched, eps_fn, verifier, (b, IMG, IMG, 3),
                        n_paths=4, n_active=2,
                        injection_steps=(t_search // 2,),
                        delta_f=t_search // 8)
        return r.best_score
    run_path(k).block_until_ready()
    t0 = time.perf_counter()
    s = float(run_path(jax.random.fold_in(k, 2)))
    out["path"] = {"wall_seconds": round(time.perf_counter() - t0, 3),
                   "best_score": s}
    out["T"] = t_search
    out["verifier"] = "ensemble(-FID + 10*IS), on-device inception"
    return out


def measure_dpm() -> dict:
    """DPM-Solver++(2M) fast sampling (beyond the reference's surface):
    same workload-1 model, 20 evals per image instead of T."""
    import jax
    import jax.numpy as jnp
    from itsd_tpu.core import dpm_solver_sample, linear_schedule
    from itsd_tpu.models import UNet, uncond_unet_config

    steps = int(os.environ.get("BENCH_DPM_STEPS", "20"))
    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 2, 2), attn=(1,),
                             num_res_blocks=2, dropout=0.1, dtype="bfloat16")
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, T)
    x = jnp.zeros((BATCH, IMG, IMG, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((BATCH,), jnp.int32))
    eps_fn = lambda xx, tt: model.apply(params, xx, tt)
    run = jax.jit(lambda noise, key: dpm_solver_sample(
        sched, eps_fn, noise, key, num_steps=steps))
    noise = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    run(noise, jax.random.PRNGKey(1)).block_until_ready()  # compile
    times = []
    for i in range(2):
        t0 = time.perf_counter()
        run(noise, jax.random.PRNGKey(10 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return {"images_per_sec": round(BATCH / best, 4), "num_steps": steps,
            "schedule_T": T, "wall_seconds": round(best, 4)}


def measure_search() -> dict:
    """Best-of-N random search throughput (BASELINE.md workload 3):
    N=16 candidates x batch 8, self-supervised verifier, one jitted program
    with the candidate axis folded into the batch."""
    import jax
    import jax.numpy as jnp
    from itsd_tpu.core import linear_schedule, sample
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.search import random_search, self_supervised_verifier

    n_cand = int(os.environ.get("BENCH_SEARCH_N", "16"))
    t_search = int(os.environ.get("BENCH_SEARCH_T", "100"))
    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 2, 2), attn=(1,),
                             num_res_blocks=2, dropout=0.1,
                             dtype="bfloat16")
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, t_search)
    x = jnp.zeros((8, IMG, IMG, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((8,), jnp.int32))
    eps_fn = lambda xx, tt: model.apply(params, xx, tt)
    denoise = lambda n, k: sample(sched, eps_fn, n, k)
    verifier = self_supervised_verifier()

    # jit the WHOLE search: one compiled program for candidate generation,
    # batched denoising, scoring and argmax (no per-op dispatch)
    @jax.jit
    def run(key):
        r = random_search(key, (8, IMG, IMG, 3), denoise, verifier,
                          n_candidates=n_cand, return_images=False)
        return r.best_noise, r.best_score, r.history["scores"]

    _, s, _ = run(jax.random.PRNGKey(1))  # warm/compile
    float(s)
    t0 = time.perf_counter()
    _, s, scores = run(jax.random.PRNGKey(2))
    best = float(s)
    dt = time.perf_counter() - t0
    return {"n_candidates": n_cand, "T": t_search,
            "wall_seconds": round(dt, 3),
            "candidates_per_sec": round(n_cand / dt, 3),
            "best_score": best, "nfes": n_cand}


def main():
    ours = measure_ours()
    base = get_baseline()
    vs = (ours["images_per_sec"] / base["images_per_sec"]
          if base.get("images_per_sec") else None)
    # BASELINE.md workloads 2-4 (structured, not prose — VERDICT r1 item 8);
    # BENCH_FAST=1 skips them, and a failure never kills the primary metric
    extra = {}
    if os.environ.get("BENCH_FAST") != "1":
        for name, fn in (("cfg", measure_cfg), ("search", measure_search),
                         ("ensemble_search", measure_ensemble_search),
                         ("fast_sampler", measure_dpm)):
            try:
                log(f"[bench] measuring workload: {name} ...")
                extra[name] = fn()
            except Exception as e:
                log(f"[bench] {name} failed: {e}")
                extra[name] = {"error": str(e)}
    print(json.dumps({
        "metric": "images_per_sec_per_chip",
        "value": round(ours["images_per_sec"], 4),
        "unit": "img/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": {
            "workload": f"CIFAR10-uncond DDPM sample T={T} batch={BATCH}",
            "ours": ours,
            "baseline_torch_cpu": base,
            **extra,
        },
    }))


if __name__ == "__main__":
    main()
