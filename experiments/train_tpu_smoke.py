"""End-to-end on-TPU validation: train a small DDPM on synthetic blobs for a
few hundred steps, then sample and check the samples' statistics moved
toward the data distribution. This is the full train->sample loop running on
the actual chip (the CPU test suite runs the same logic at tiny scale)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from itsd_tpu.core import linear_schedule, sample
from itsd_tpu.data import BatchIterator, synthetic_dataset
from itsd_tpu.models import UNet, uncond_unet_config
from itsd_tpu.train import (OptimizerConfig, create_train_state,
                            make_optimizer, make_train_step)


def main(steps=300):
    cfg = uncond_unet_config(ch=64, ch_mult=(1, 2), attn=(1,),
                             num_res_blocks=2, dropout=0.1,
                             dtype="bfloat16")
    model = UNet(cfg)
    sched = linear_schedule(1e-4, 0.02, 200)
    images, _ = synthetic_dataset(n=512, img_size=16, seed=0)
    it = BatchIterator(images, None, batch_size=128, seed=0)

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 16, 16, 3)), jnp.zeros((2,), jnp.int32))
    tx = make_optimizer(OptimizerConfig(lr=3e-4, epochs=100,
                                        steps_per_epoch=4))
    state = create_train_state(params, tx)
    step = make_train_step(lambda p, *a, **kw: model.apply(p, *a, **kw),
                           sched, tx)

    key = jax.random.PRNGKey(1)
    losses = []
    t0 = time.time()
    n = 0
    while n < steps:
        for batch in it:
            key, sk = jax.random.split(key)
            state, m = step(state, {"image": jnp.asarray(batch["image"])},
                            sk)
            losses.append(float(m["loss"]))
            n += 1
            if n >= steps:
                break
    train_s = time.time() - t0

    eps_fn = lambda x, t: model.apply(state.ema_params, x, t)
    out = sample(sched, eps_fn, jax.random.normal(
        jax.random.PRNGKey(2), (64, 16, 16, 3)), jax.random.PRNGKey(3))
    out = np.asarray(out)

    data_mean = float(images.mean())
    data_std = float(images.std())
    print(json.dumps({
        "steps": n,
        "train_seconds": round(train_s, 1),
        "loss_first10": round(float(np.mean(losses[:10])), 4),
        "loss_last10": round(float(np.mean(losses[-10:])), 4),
        "data_mean": round(data_mean, 3), "data_std": round(data_std, 3),
        "sample_mean": round(float(out.mean()), 3),
        "sample_std": round(float(out.std()), 3),
    }))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), "loss didn't drop"


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
