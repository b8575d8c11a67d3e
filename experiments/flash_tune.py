"""Autotune the Pallas flash-attention block sizes at the flagship shape.

Round 3 measured the kernel at 61% end-to-end MFU with the default
(block_q=512, block_k=1024) picked by `_pick_block`
(kernels/attention.py:88). This sweeps the (block_q, block_k) grid at the
reference-flagship attention operand — the 256x256 UNet's stage-2
self-attention: [B=8, N=4096, C=384] bf16 — for the forward kernel and
the full custom-VJP fwd+bwd, and reports the best configuration vs the
default. If a config beats the default by >3% the defaults in
`_pick_block` should be re-pointed (follow-up commit).

Usage: python experiments/flash_tune.py [--batch 8] [--tokens 4096]
Writes: docs/results/flash_tune.json (resumable per-cell)
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULTS = os.path.join(REPO, "docs", "results")


def note(m):
    print(f"[flash-tune] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tokens", type=int, default=4096)
    ap.add_argument("--channels", type=int, default=384)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from itsd_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from itsd_tpu.kernels.attention import (_attention_flash,
                                            _flash_attention_diff)

    B, N, C = args.batch, args.tokens, args.channels
    scale = C ** -0.5
    kq = jax.random.PRNGKey(0)
    q = jax.random.normal(kq, (B, N, C), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(kq, 1), (B, N, C),
                          jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(kq, 2), (B, N, C),
                          jnp.bfloat16)

    out_path = os.path.join(RESULTS, "flash_tune.json")
    report = {}
    if os.path.isfile(out_path):
        with open(out_path) as f:
            report = json.load(f)
    report["shape"] = {"B": B, "N": N, "C": C, "dtype": "bfloat16"}
    cells = report.setdefault("cells", {})

    # attention FLOPs: 2 matmuls of [N,N]x[N,C] per batch row (x2 for
    # MACs), x ~2.5 for the backward's recompute+dq+dk+dv
    fwd_flops = 2 * 2 * B * N * N * C

    bqs = [b for b in (128, 256, 512, 1024) if N % b == 0]
    bks = [b for b in (128, 256, 512, 1024, 2048) if N % b == 0]

    def timeit(fn, *a):
        jax.block_until_ready(fn(*a))  # compile
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            walls.append(time.perf_counter() - t0)
        return min(walls)

    for bq, bk in itertools.product(bqs, bks):
        tag = f"fwd_q{bq}_k{bk}"
        if tag in cells:
            continue
        try:
            interp = os.environ.get("ITSD_FLASH_TUNE_INTERPRET") == "1"
            fn = jax.jit(lambda qq, kk, vv, _bq=bq, _bk=bk:
                         _attention_flash(qq, kk, vv, scale,
                                          block_q=_bq, block_k=_bk,
                                          interpret=interp))
            wall = timeit(fn, q, k, v)
            cells[tag] = {"block_q": bq, "block_k": bk,
                          "ms": round(wall * 1e3, 3),
                          "tflops": round(fwd_flops / wall / 1e12, 1),
                          "mfu_vs_197": round(
                              fwd_flops / wall / 197e12, 3)}
            note(f"{tag}: {cells[tag]}")
        except Exception as e:
            cells[tag] = {"error": f"{type(e).__name__}: {e}"}
            note(f"{tag} FAILED: {cells[tag]['error']}")
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)

    # fwd+bwd through the public custom-VJP entry (default blocks only —
    # the bwd kernel reuses _pick_block; a win on fwd blocks motivates
    # re-pointing both)
    if "fwd_bwd_default" not in cells:
        try:
            def loss(qq, kk, vv):
                return jnp.sum(_flash_attention_diff(scale, qq, kk, vv)
                               .astype(jnp.float32))
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            wall = timeit(lambda a, b, c: g(a, b, c), q, k, v)
            cells["fwd_bwd_default"] = {"ms": round(wall * 1e3, 3)}
        except Exception as e:
            cells["fwd_bwd_default"] = {"error": f"{type(e).__name__}: {e}"}
        note(f"fwd_bwd_default: {cells['fwd_bwd_default']}")
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)

    ok = {t: c for t, c in cells.items()
          if t.startswith("fwd_") and "ms" in c and t != "fwd_bwd_default"}
    if ok:
        best = min(ok, key=lambda t: ok[t]["ms"])
        default = "fwd_q512_k1024"
        report["best_fwd"] = {**ok[best], "tag": best}
        if default in ok:
            report["default_fwd"] = {**ok[default], "tag": default}
            report["best_vs_default_speedup"] = round(
                ok[default]["ms"] / ok[best]["ms"], 3)
        note(f"best {best} ({ok[best]['ms']} ms) vs default "
             f"{ok.get(default, {}).get('ms')} ms")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
