"""Single-step ViT train/sampler MFU probe + backward-pass diagnosis.

Why: XLA's `cost_analysis()` on a `lax.scan` program reports the loop body
ONCE (not x trip-count), so MFU derived from a scan chunk understates by
the chunk length — this probe jits ONE train step / ONE denoise eval so
the cost model and the wall clock measure the same thing.

It also A/Bs the hypothesis for the ViT backward being slow relative to
its forward (sampler ~60% MFU vs train ~20% from the training-run wall
clocks): activation dropout draws threefry bits for [B,N,E] and
[B,N,4E] tensors 3x per block — vector-unit work with no MXU content
that the UNet (dropout only on one [B,H,W,C] tensor per ResBlock) barely
notices. Variants: dropout=0.1 (as trained), dropout=0.0, and dropout=0.1
with the cheaper 'rbg' PRNG.

Usage: python experiments/vit_mfu_probe.py [--batch 256]
Writes: docs/results/vit_mfu.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS = os.path.join(REPO, "docs", "results")
PEAK = 197e12


def note(m):
    print(f"[vit-mfu] {m}", file=sys.stderr, flush=True)


def flops_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)) or None


def run_matrix(out_path: str):
    """DiT-scale probe matrix (VERDICT r3 weak #4: 'does remat/rbg pay at
    E>=768, where the knobs were built for?' — measured, not asserted):
    two scales x {dropout 0, 0.1} x {threefry, rbg} x {remat on/off}.

      vit32_p4    — 32x32 patch-4: 64 tokens, E=768 d=12 (DiT-S/4-shaped
                    compute at the repo's 32x32 operating point)
      vit256_p16  — 256x256 patch-16: 256 tokens, E=768 d=12 h=12 — the
                    reference's OWN ViT defaults
                    (/root/reference/Diffusion/Model.py:372-374)

    Rows are written to `out_path` after EVERY measurement (relay-flap
    resumable: existing rows are skipped on rerun)."""
    import jax
    import jax.numpy as jnp

    from experiments.vit_shapes import TRAIN_T
    from itsd_tpu.core import linear_schedule
    from itsd_tpu.models import ViT, ViTConfig
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer, make_train_step)

    sched = linear_schedule(1e-4, 0.02, TRAIN_T)
    scales = {
        "vit32_p4_e768_d12": dict(img=32, patch=4, batch=128),
        "vit256_p16_e768_d12_reference_default": dict(img=256, patch=16,
                                                      batch=32),
    }
    emb, depth, heads = 768, 12, 12
    if os.environ.get("ITSD_VIT_MATRIX_SMOKE") == "1":  # CPU plumbing test
        scales = {"vit32_p4_e768_d12": dict(img=16, patch=8, batch=2)}
        emb, depth, heads = 16, 2, 2
        # never contaminate the real result file with smoke rows (the
        # resumable skip would then mask them on the real TPU run)
        out_path = out_path.replace(".json", "_smoke.json")
    variants = [
        dict(dropout=0.0, prng="threefry", remat=False),
        dict(dropout=0.0, prng="threefry", remat=True),
        dict(dropout=0.1, prng="threefry", remat=False),
        dict(dropout=0.1, prng="threefry", remat=True),
        dict(dropout=0.1, prng="rbg", remat=False),
        dict(dropout=0.1, prng="rbg", remat=True),
    ]
    report = {}
    if os.path.isfile(out_path):
        with open(out_path) as f:
            report = json.load(f)
    report.setdefault("peak_tflops", PEAK / 1e12)
    report.setdefault("model", "E=768 depth=12 heads=12 mlp=4 bf16")

    for sname, s in scales.items():
        rows = report.setdefault(sname, {})
        rows["tokens"] = (s["img"] // s["patch"]) ** 2
        rows["batch"] = s["batch"]
        x0 = jax.random.normal(jax.random.PRNGKey(1),
                               (s["batch"], s["img"], s["img"], 3))
        for v in variants:
            tag = (f"drop{v['dropout']}_{v['prng']}"
                   f"{'_remat' if v['remat'] else ''}")
            if tag in rows and "error" not in rows[tag]:
                note(f"{sname}/{tag}: already measured, skipping")
                continue
            cfg = ViTConfig(img_size=s["img"], patch_size=s["patch"],
                            embed_dim=emb, depth=depth, num_heads=heads,
                            mlp_ratio=4.0, dropout=v["dropout"],
                            attention_impl="auto", dtype="bfloat16",
                            remat=v["remat"])
            model = ViT(cfg)
            key = (jax.random.key(2, impl="rbg") if v["prng"] == "rbg"
                   else jax.random.PRNGKey(2))
            try:
                params = model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((2, s["img"], s["img"], 3)),
                                    jnp.zeros((2,), jnp.int32))
                tx = make_optimizer(OptimizerConfig(
                    lr=2e-4, epochs=4, steps_per_epoch=32, ema_decay=0.999))
                state = create_train_state(params, tx, ema=True)
                step = jax.jit(make_train_step(
                    lambda p, *aa, **kw: model.apply(p, *aa, **kw), sched,
                    tx, ema_decay=0.999, donate=False))
                bd = {"image": x0}
                note(f"{sname}/{tag}: compiling ...")
                fl = flops_of(step.lower(state, bd, key).compile())
                state, m = step(state, bd, key)
                jax.block_until_ready(m)
                walls = []
                for i in range(5):
                    k = jax.random.fold_in(key, i)
                    t0 = time.perf_counter()
                    state, m = step(state, bd, k)
                    jax.block_until_ready(m)
                    walls.append(time.perf_counter() - t0)
                best = min(walls)
                rows[tag] = {
                    "ms_per_step": round(best * 1e3, 2),
                    "images_per_sec": round(s["batch"] / best, 1),
                    "flops_per_step": fl,
                    "mfu_vs_197tflops": (round(fl / best / PEAK, 3)
                                         if fl else None)}
                note(f"{sname}/{tag}: {rows[tag]}")
                del state, params
            except Exception as e:
                rows[tag] = {"error": f"{type(e).__name__}: {e}"}
                note(f"{sname}/{tag} FAILED: {rows[tag]['error']}")
            with open(out_path, "w") as f:
                json.dump(report, f, indent=1)
    note(f"-> {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--skip-large", action="store_true")
    ap.add_argument("--matrix", action="store_true",
                    help="run the DiT-scale remat/rbg matrix instead of "
                         "the trained-config diagnosis")
    args = ap.parse_args()

    if args.matrix:
        from itsd_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
        run_matrix(os.path.join(RESULTS, "vit_mfu_large.json"))
        return

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from experiments.vit_shapes import VIT, TRAIN_T, build_vit
    from itsd_tpu.core import linear_schedule
    from itsd_tpu.models import ViTConfig, ViT
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer, make_train_step)

    sched = linear_schedule(1e-4, 0.02, TRAIN_T)
    B = args.batch
    img = VIT["img"]
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, img, img, 3))
    out = {"batch": B, "model": dict(VIT), "peak_tflops": PEAK / 1e12}

    def time_step(model, key, tag):
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
        batch_d = {"image": x0}
        lowered = step.lower(state, batch_d, key)
        compiled = lowered.compile()
        fl = flops_of(compiled)
        state, m = step(state, batch_d, key)
        jax.block_until_ready(m)
        walls = []
        for i in range(5):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            state, m = step(state, batch_d, k)
            jax.block_until_ready(m)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        rec = {"ms_per_step": round(best * 1e3, 2),
               "images_per_sec": round(B / best, 1),
               "flops_per_step": fl,
               "mfu_vs_197tflops": round(fl / best / PEAK, 3) if fl else None}
        note(f"{tag}: {rec}")
        return rec

    # 1. as trained: dropout 0.1, threefry key
    model = build_vit()
    out["train_dropout0.1_threefry"] = time_step(
        model, jax.random.PRNGKey(2), "dropout=0.1 threefry")

    # 2. no dropout
    cfg0 = ViTConfig(img_size=img, patch_size=VIT["patch_size"],
                     embed_dim=VIT["embed_dim"], depth=VIT["depth"],
                     num_heads=VIT["num_heads"], mlp_ratio=VIT["mlp_ratio"],
                     dropout=0.0, attention_impl="auto", dtype="bfloat16")
    out["train_dropout0.0"] = time_step(
        ViT(cfg0), jax.random.PRNGKey(2), "dropout=0.0")

    # 3. dropout 0.1 with the cheap non-cryptographic TPU PRNG
    out["train_dropout0.1_rbg"] = time_step(
        model, jax.random.key(2, impl="rbg"), "dropout=0.1 rbg")

    # 5./6. per-block remat: the trace (mfu_vit_train.json) shows the
    # backward HBM-bound on stored activations; recompute trades idle-MXU
    # FLOPs for HBM traffic
    def vit_cfg(**kw):
        base = dict(img_size=img, patch_size=VIT["patch_size"],
                    embed_dim=VIT["embed_dim"], depth=VIT["depth"],
                    num_heads=VIT["num_heads"], mlp_ratio=VIT["mlp_ratio"],
                    dropout=VIT["dropout"], attention_impl="auto",
                    dtype="bfloat16")
        base.update(kw)
        return ViTConfig(**base)

    out["train_dropout0.0_remat"] = time_step(
        ViT(vit_cfg(dropout=0.0, remat=True)), jax.random.PRNGKey(2),
        "dropout=0.0 remat")
    out["train_dropout0.1_rbg_remat"] = time_step(
        ViT(vit_cfg(remat=True)), jax.random.key(2, impl="rbg"),
        "dropout=0.1 rbg remat")

    # 7. scale check: 64x64/patch-2 = 1024 tokens, embed 512, head_dim 128
    # (flash-eligible, so the Pallas fwd+bwd kernels run in training).
    # Tests whether transformer train MFU recovers at DiT-realistic scale.
    if not args.skip_large:
        big = ViTConfig(img_size=64, patch_size=2, embed_dim=512, depth=8,
                        num_heads=4, mlp_ratio=4.0, dropout=0.0,
                        attention_impl="auto", dtype="bfloat16")
        Bl = 64
        xl = jax.random.normal(jax.random.PRNGKey(4), (Bl, 64, 64, 3))
        model_l = ViT(big)
        params = model_l.init(jax.random.PRNGKey(0),
                              jnp.zeros((2, 64, 64, 3)),
                              jnp.zeros((2,), jnp.int32))
        tx = make_optimizer(OptimizerConfig(lr=2e-4, epochs=4,
                                            steps_per_epoch=32,
                                            ema_decay=0.999))
        state = create_train_state(params, tx, ema=True)
        step = jax.jit(make_train_step(
            lambda p, *aa, **kw: model_l.apply(p, *aa, **kw), sched, tx,
            ema_decay=0.999, donate=False))
        bd = {"image": xl}
        fl = flops_of(step.lower(state, bd, jax.random.PRNGKey(2)).compile())
        state, m = step(state, bd, jax.random.PRNGKey(2))
        jax.block_until_ready(m)
        walls = []
        for i in range(5):
            t0 = time.perf_counter()
            state, m = step(state, bd, jax.random.fold_in(
                jax.random.PRNGKey(2), i))
            jax.block_until_ready(m)
            walls.append(time.perf_counter() - t0)
        best = min(walls)
        out["train_vit64_1024tok_d128_flash_nodrop"] = {
            "img": 64, "tokens": 1024, "embed_dim": 512, "head_dim": 128,
            "batch": Bl, "ms_per_step": round(best * 1e3, 2),
            "flops_per_step": fl,
            "mfu_vs_197tflops": round(fl / best / PEAK, 3) if fl else None}
        note(f"vit64 flash: {out['train_vit64_1024tok_d128_flash_nodrop']}")

    # 4. forward-only (one denoise eval), batch 8 — the sampler's unit
    model_f = build_vit()
    params = model_f.init(jax.random.PRNGKey(0),
                          jnp.zeros((2, img, img, 3)),
                          jnp.zeros((2,), jnp.int32))
    x8 = jax.random.normal(jax.random.PRNGKey(3), (8, img, img, 3))
    t8 = jnp.full((8,), 500, jnp.int32)
    fwd = jax.jit(lambda p, xx, tt: model_f.apply(p, xx, tt))
    fl = flops_of(fwd.lower(params, x8, t8).compile())
    jax.block_until_ready(fwd(params, x8, t8))
    walls = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(params, x8, t8))
        walls.append(time.perf_counter() - t0)
    best = min(walls)
    out["forward_batch8"] = {
        "ms_per_eval": round(best * 1e3, 3), "flops_per_eval": fl,
        "mfu_vs_197tflops": round(fl / best / PEAK, 3) if fl else None,
        "note": "per-launch relay dispatch inflates a single-eval wall; "
                "the scan-amortised sampler number in vit_shapes.json is "
                "the honest one"}
    note(f"fwd batch8: {out['forward_batch8']}")

    path = os.path.join(RESULTS, "vit_mfu.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    note(f"-> {path}")


if __name__ == "__main__":
    main()
