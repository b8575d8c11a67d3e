"""A/B perf experiments on the real TPU: attention impl, param dtype,
batch scaling. Informs kernel dispatch thresholds and bench defaults."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from itsd_tpu.core import linear_schedule, sample
from itsd_tpu.models import UNet, uncond_unet_config

T = 100


def run(batch, dtype, attn, cast_params):
    cfg = uncond_unet_config(ch=128, ch_mult=(1, 2, 2, 2), attn=(1,),
                             num_res_blocks=2, dropout=0.1, dtype=dtype,
                             attention_impl=attn)
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, T)
    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)
    if cast_params:
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
    eps_fn = lambda xx, tt: model.apply(params, xx, tt)
    f = jax.jit(lambda n, k: sample(sched, eps_fn, n, k))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    f(noise, jax.random.PRNGKey(2)).block_until_ready()
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        f(noise, jax.random.PRNGKey(3 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    ips = batch / best * (T / 1000) * 1000 / T  # img/s at this T
    print(json.dumps({"batch": batch, "dtype": dtype, "attn": attn,
                      "cast_params": cast_params,
                      "sec_per_T100": round(best, 4),
                      "img_per_sec_at_T100": round(batch / best, 2)}),
          flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("all", "attn"):
        for attn in ("flash", "xla"):
            run(8, "bfloat16", attn, False)
    if mode in ("all", "cast"):
        run(8, "bfloat16", "auto", True)
    if mode in ("all", "batch"):
        for b in (64, 256):
            run(b, "bfloat16", "auto", False)
