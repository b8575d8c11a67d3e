"""Config tree, overrides, data pipelines, image grids, logging."""

import json
import os

import numpy as np
import pytest

from itsd_tpu.data import BatchIterator, synthetic_dataset
from itsd_tpu.utils import (Config, apply_overrides, coerce, load_config,
                            make_grid, save_image_grid, MetricsLogger)


def test_coerce_reference_strings():
    # mirrors Main.py:38-60 coercion
    assert coerce("none") is None
    assert coerce("null") is None
    assert coerce("true") is True
    assert coerce("False") is False
    assert coerce("42") == 42
    assert coerce("1e-4") == 1e-4
    assert coerce("[1, 2, 3]") == (1, 2, 3)
    assert coerce("hello") == "hello"


def test_overrides_dotted_and_legacy():
    cfg = Config()
    apply_overrides(cfg, ["diffusion.T=500", "T=250"])  # legacy key wins last
    assert cfg.diffusion.T == 250
    apply_overrides(cfg, ["channel_mult=[1,4,8]", "inference_T=none",
                          "train.lr=5e-5", "state=eval"])
    assert cfg.model.channel_mult == (1, 4, 8)
    assert cfg.diffusion.inference_T is None
    assert cfg.train.lr == 5e-5
    assert cfg.state == "eval"
    with pytest.raises(KeyError):
        apply_overrides(cfg, ["no.such.key=1"])


def test_yaml_roundtrip(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text(
        "state: eval\nT: 2000\nmodel:\n  channel: 64\n"
        "data:\n  img_size: 64\n")
    cfg = load_config(str(y), overrides=["beta_T=0.028"])
    assert cfg.state == "eval"
    assert cfg.diffusion.T == 2000
    assert cfg.model.channel == 64
    assert cfg.data.img_size == 64
    assert cfg.diffusion.beta_T == 0.028


def test_synthetic_dataset_and_iterator():
    x, y = synthetic_dataset(n=64, img_size=16)
    assert x.shape == (64, 16, 16, 3)
    assert x.min() >= -1 and x.max() <= 1
    it = BatchIterator(x, y, batch_size=16, seed=0)
    batches = list(it)
    assert len(batches) == 4
    assert batches[0]["image"].shape == (16, 16, 16, 3)
    assert batches[0]["label"].shape == (16,)
    # two epochs shuffle differently
    b2 = list(it)
    assert not np.array_equal(batches[0]["image"], b2[0]["image"])


def test_make_grid_and_save(tmp_path):
    imgs = np.random.default_rng(0).uniform(-1, 1, (10, 8, 8, 3)).astype(
        np.float32)
    grid = make_grid(imgs, nrow=4)
    # 3 rows of 4 with 2px padding
    assert grid.shape == (3 * 10 + 2, 4 * 10 + 2, 3)
    assert grid.dtype == np.uint8
    p = tmp_path / "grid.png"
    save_image_grid(imgs, str(p), nrow=4)
    assert p.exists() and p.stat().st_size > 0


def test_metrics_logger(tmp_path):
    p = tmp_path / "log" / "metrics.jsonl"
    lg = MetricsLogger(str(p), also_print=False)
    lg.log({"step": 1, "loss": 0.5})
    lg.log({"step": 2, "loss": 0.25})
    lg.close()
    lines = [json.loads(l) for l in p.read_text().splitlines()]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2
    assert "time" in lines[0]


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from itsd_tpu.train import (OptimizerConfig, create_train_state,
                                make_optimizer)
    from itsd_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    params = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                         "b": jnp.zeros(3)}}
    tx = make_optimizer(OptimizerConfig())
    state = create_train_state(params, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, state)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["params"]["w"]),
        np.asarray(params["params"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["params"]["w"]),
        np.asarray(params["params"]["w"]))


def test_shapes_dataset_is_class_structured():
    """The procedural shapes dataset must be learnable: images in [-1,1],
    deterministic per seed, and with per-class pixel statistics that differ
    (a classifier verifier needs real class structure — VERDICT r1 item 1)."""
    import numpy as np
    from itsd_tpu.data import shapes_dataset
    x, y = shapes_dataset(n=200, img_size=16, seed=3)
    assert x.shape == (200, 16, 16, 3) and x.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert set(np.unique(y)) <= set(range(10))
    x2, y2 = shapes_dataset(n=200, img_size=16, seed=3)
    np.testing.assert_array_equal(x, x2)
    # family hue split: red-family classes (0-4) vs blue-family (5-9)
    red = x[y < 5][..., 0].mean()
    blue = x[y >= 5][..., 2].mean()
    red_other = x[y >= 5][..., 0].mean()
    assert red > red_other  # red channel hotter in the red family
    assert blue > x[y < 5][..., 2].mean()


def test_threaded_prefetch_order_sharding_and_errors():
    """threaded_prefetch: same batches in the same order as the source
    iterator, batches land sharded over the mesh, and producer exceptions
    surface at the consumer (not silently swallowed on the thread)."""
    import jax
    from itsd_tpu.data.datasets import threaded_prefetch
    from itsd_tpu.parallel import batch_sharding, make_mesh

    batches = [{"image": np.full((8, 4, 4, 3), i, np.float32)}
               for i in range(5)]
    got = list(threaded_prefetch(iter(batches), size=2))
    assert len(got) == 5
    for i, b in enumerate(got):
        assert float(np.asarray(b["image"])[0, 0, 0, 0]) == i

    mesh = make_mesh(axis_names=("data",))
    sh = batch_sharding(mesh)
    got = list(threaded_prefetch(iter(batches[:2]), size=2, sharding=sh))
    assert got[0]["image"].sharding == sh

    def bad():
        yield batches[0]
        raise RuntimeError("producer boom")

    it = threaded_prefetch(bad(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="producer boom"):
        next(it)


def test_load_cifar10_from_synthesized_batches(tmp_path):
    """load_cifar10 reads the standard cifar-10-batches-py pickle layout
    (and extracts the .tar.gz form) — synthesized here since no real
    CIFAR-10 exists on this machine."""
    import pickle
    import tarfile
    from itsd_tpu.data import load_cifar10

    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        d = {b"data": rng.integers(0, 256, (20, 3072), dtype=np.uint8),
             b"labels": rng.integers(0, 10, 20).tolist()}
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(d, f)
    d = {b"data": rng.integers(0, 256, (10, 3072), dtype=np.uint8),
         b"labels": rng.integers(0, 10, 10).tolist()}
    with open(base / "test_batch", "wb") as f:
        pickle.dump(d, f)

    x, y = load_cifar10(str(tmp_path), train=True)
    assert x.shape == (100, 32, 32, 3) and y.shape == (100,)
    assert -1.0 <= x.min() and x.max() <= 1.0
    assert y.dtype == np.int32 and set(np.unique(y)) <= set(range(10))
    xt, yt = load_cifar10(str(tmp_path), train=False)
    assert xt.shape == (10, 32, 32, 3)

    x2, _ = load_cifar10(str(tmp_path), train=True, subset_ratio=0.5)
    assert x2.shape[0] == 50

    # tar.gz form: pack the dir, move it away, reload from the archive
    tgz_root = tmp_path / "tgz"
    tgz_root.mkdir()
    with tarfile.open(tgz_root / "cifar-10-python.tar.gz", "w:gz") as tf:
        tf.add(base, arcname="cifar-10-batches-py")
    x3, _ = load_cifar10(str(tgz_root), train=True)
    assert x3.shape == (100, 32, 32, 3)

    with pytest.raises(FileNotFoundError):
        load_cifar10(str(tmp_path / "nope"))


def test_load_image_folder(tmp_path):
    """Class-per-subdirectory tree -> arrays with resize + center crop
    (mirrors the reference's ImageFolder transforms, Train.py:452-467)."""
    from PIL import Image
    from itsd_tpu.data import load_image_folder

    rng = np.random.default_rng(0)
    for ci, cls in enumerate(["cat", "dog"]):
        d = tmp_path / cls
        d.mkdir()
        for j, size in enumerate([(40, 24), (16, 16), (31, 57)]):
            arr = rng.integers(0, 256, size + (3,), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img{j}.png")
        (d / "notes.txt").write_text("ignored non-image file")

    x, y = load_image_folder(str(tmp_path), img_size=16)
    assert x.shape == (6, 16, 16, 3)
    assert list(np.bincount(y)) == [3, 3]
    assert -1.0 <= x.min() and x.max() <= 1.0

    x2, y2 = load_image_folder(str(tmp_path), img_size=16, max_images=2)
    assert x2.shape[0] == 2


def test_threaded_prefetch_early_exit_stops_producer():
    """Abandoning the consumer mid-iteration (break) must release the
    producer thread — no thread left parked on a full queue pinning
    device-resident batches."""
    import gc
    import threading
    import time
    from itsd_tpu.data.datasets import threaded_prefetch

    batches = ({"image": np.zeros((4, 4, 4, 3), np.float32)}
               for _ in range(100))
    before = threading.active_count()
    it = threaded_prefetch(batches, size=2)
    next(it)
    it.close()          # what GC does to an abandoned generator
    gc.collect()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_chunked_device_put_piecewise_equals_whole():
    """Relay-bounded piecewise upload must be bit-identical to one
    device_put, including non-divisible chunk tails and the small-array
    single-put fast path."""
    from itsd_tpu.utils import chunked_device_put

    a = np.random.default_rng(0).normal(size=(37, 5, 3)).astype(np.float32)
    out = chunked_device_put(a, max_bytes=4 * 5 * 3 * 4)  # 4 rows/piece
    assert np.array_equal(np.asarray(out), a)
    assert np.array_equal(np.asarray(chunked_device_put(a)), a)
    empty = np.zeros((0, 7), np.float32)
    assert np.asarray(chunked_device_put(empty)).shape == (0, 7)
