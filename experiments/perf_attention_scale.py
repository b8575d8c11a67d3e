"""Flash vs XLA attention at the reference's scaling wall: img_size=256 with
attention at the 64x64 stage = 4096 tokens, where the reference materialises
a [B, 4096, 4096] score matrix per image (`Diffusion/Model.py:152-161`)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from itsd_tpu.kernels.attention import _attention_flash, _attention_xla


def bench(n_tokens, channels, batch, impl):
    k = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(k, 3)
    shape = (batch, n_tokens, channels)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    kx = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    scale = channels ** -0.5
    if impl == "flash":
        f = jax.jit(lambda q, k, v: _attention_flash(q, k, v, scale))
    else:
        f = jax.jit(lambda q, k, v: _attention_xla(q, k, v, scale))
    # chain iterations (output feeds input) inside one jitted scan and force
    # a host read: on this platform block_until_ready on standalone ops can
    # return before execution completes, producing impossible timings
    REPS = 20

    def chained(q, k, v):
        def body(qc, _):
            return f(qc, k, v), None
        out, _ = jax.lax.scan(body, q, None, length=REPS)
        return out.sum()

    g = jax.jit(chained)
    float(g(q, kx, v))  # compile + settle
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(q, kx, v))
        times.append((time.perf_counter() - t0) / REPS)
    best = min(times)
    print(json.dumps({"n_tokens": n_tokens, "channels": channels,
                      "batch": batch, "impl": impl,
                      "ms": round(best * 1e3, 3)}), flush=True)
    return best


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    # the 64x64 stage of an img_size=256 UNet with ch=128, mult 2 -> C=256
    if which in ("both", "flash"):
        bench(4096, 256, 8, "flash")
    if which in ("both", "xla"):
        bench(4096, 256, 8, "xla")
