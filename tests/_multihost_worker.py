"""Worker process for the real multi-process (multi-host) test.

Spawned twice by tests/test_multihost.py with a shared coordinator port.
Each process owns 2 virtual CPU devices, so the initialized runtime spans
2 processes x 2 devices = a 4-device global mesh — the smallest honest
model of a multi-host TPU slice (the reference has no multi-process story
at all: single-process DataParallel only,
`/root/reference/Diffusion/Train.py:543-554`).

Checks, per process:
  1. jax.distributed.initialize via itsd_tpu.parallel.maybe_initialize_distributed
     wires a global runtime (process_count == 2, 4 global devices).
  2. shard_batch(process_local=True) assembles the correct GLOBAL array
     from per-process local slices (validated through a mesh-wide
     reduction that needs every shard).
  3. One full SPMD train step on the global mesh matches the same step
     computed on a single local device with the full global batch.

Prints "MULTIHOST_OK <loss_spmd> <loss_local>" on success; any assertion
failure propagates as a non-zero exit the parent test reports.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from itsd_tpu.parallel import (make_mesh, maybe_initialize_distributed,
                                   replicated, shard_batch)

    assert maybe_initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc,
        process_id=pid) is True
    assert jax.process_count() == nproc, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == nproc * n_local, (n_global, n_local)

    # --- shard_batch(process_local=True) assembles the right global array
    B_local = 4
    global_images = np.arange(
        nproc * B_local * 8 * 8 * 3, dtype=np.float32).reshape(
        nproc * B_local, 8, 8, 3) / 1000.0
    global_labels = np.arange(nproc * B_local, dtype=np.int32) % 4
    local = {"image": global_images[pid * B_local:(pid + 1) * B_local],
             "label": global_labels[pid * B_local:(pid + 1) * B_local]}

    mesh = make_mesh(axis_names=("data",))
    batch = shard_batch(local, mesh, process_local=True)
    assert batch["image"].shape == global_images.shape, batch["image"].shape

    # a mesh-wide weighted reduction needs every shard: if any process's
    # rows landed in the wrong global slots, this diverges from the
    # host-side value
    w = np.linspace(0.5, 1.5, global_images.shape[0]).astype(np.float32)
    expect = float((global_images.sum(axis=(1, 2, 3)) * w).sum())

    @jax.jit
    def weighted_sum(img):
        return (img.sum(axis=(1, 2, 3)) * jnp.asarray(w)).sum()

    got = float(weighted_sum(batch["image"]))
    assert abs(got - expect) < 1e-2 * max(1.0, abs(expect)), (got, expect)

    # --- one SPMD train step == single-device step on the global batch
    from itsd_tpu.core import linear_schedule
    from itsd_tpu.models import UNet, uncond_unet_config
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer, make_train_step)

    ucfg = uncond_unet_config(ch=8, ch_mult=(1,), attn=(), num_res_blocks=1,
                              dropout=0.0, T=8)
    model = UNet(ucfg)
    sched = linear_schedule(1e-4, 0.02, 8)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 8, 8, 3)), jnp.zeros((2,), jnp.int32))
    tx = make_optimizer(OptimizerConfig(lr=1e-4, epochs=1,
                                        steps_per_epoch=4))
    # donate=False: both runs reuse `params` (device_put may alias instead
    # of copy, so a donated state would delete the shared buffers)
    step = make_train_step(
        lambda p, *a, **kw: model.apply(p, *a, **kw), sched, tx,
        donate=False)
    key = jax.random.PRNGKey(7)

    params_spmd = jax.device_put(params, replicated(mesh))
    state = create_train_state(params_spmd, tx)
    _, m = step(state, {"image": batch["image"]}, key)
    loss_spmd = float(m["loss"])

    # reference: same global batch, one LOCAL device, same key
    dev = jax.local_devices()[0]
    params_loc = jax.device_put(params, dev)
    state_loc = create_train_state(params_loc, tx)
    img_loc = jax.device_put(jnp.asarray(global_images), dev)
    _, m_loc = step(state_loc, {"image": img_loc}, key)
    loss_local = float(m_loc["loss"])

    assert abs(loss_spmd - loss_local) < 1e-4 * max(1.0, abs(loss_local)), (
        loss_spmd, loss_local)
    print(f"MULTIHOST_OK {loss_spmd} {loss_local}", flush=True)


if __name__ == "__main__":
    main()
