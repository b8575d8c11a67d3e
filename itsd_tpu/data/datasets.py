"""Host-side input pipelines — the replacement for the reference's
torchvision `CIFAR10` / `ImageFolder` + DataLoader-worker stack
(`/root/reference/DiffusionFreeGuidence/TrainCondition.py:24-31`,
`/root/reference/Diffusion/Train.py:449-514`).

Design: datasets are simple iterables of numpy batches
``{"image": [B,H,W,C] float32 in [-1,1], "label": [B] int32?}``; sharded
placement onto the mesh happens in the training loop via
`parallel.shard_batch`. Augmentation (random horizontal flip — the only one
the reference uses, plus resize/normalize) is pure numpy on host.

Sources:
* ``Cifar10``        — reads the standard python-pickle CIFAR-10 archive
                       from a local directory (no download in this
                       environment; path-configurable like the reference's
                       `imagenet_root`).
* ``ImageFolderDataset`` — class-per-subdirectory layout, PNG decoding via
                       PIL if available.
* ``SyntheticDataset`` — deterministic random data for tests/benchmarks.

All loaders support ``subset_ratio`` (the reference's
``train_subset_ratio``, `Train.py:479-510`).
"""

from __future__ import annotations

import os
import pickle
import tarfile
from typing import Iterator, Optional, Tuple

import numpy as np


class BatchIterator:
    """Shuffling batch iterator over in-memory arrays."""

    def __init__(self, images: np.ndarray, labels: Optional[np.ndarray],
                 batch_size: int, seed: int = 0, flip: bool = True,
                 drop_remainder: bool = True):
        self.images = images
        self.labels = labels
        self.batch_size = batch_size
        self.flip = flip
        self.drop_remainder = drop_remainder
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.images) // self.batch_size
        if not self.drop_remainder and len(self.images) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator[dict]:
        order = self._rng.permutation(len(self.images))
        for i in range(len(self)):
            idx = order[i * self.batch_size:(i + 1) * self.batch_size]
            imgs = self.images[idx]
            if self.flip:
                flip_mask = self._rng.random(len(idx)) < 0.5
                imgs = imgs.copy()
                imgs[flip_mask] = imgs[flip_mask, :, ::-1]
            batch = {"image": imgs.astype(np.float32)}
            if self.labels is not None:
                batch["label"] = self.labels[idx].astype(np.int32)
            yield batch


def _to_unit_interval(u8: np.ndarray) -> np.ndarray:
    """uint8 HWC -> float32 [-1, 1] (the reference normalises with
    mean=std=0.5, `TrainCondition.py:26-29`)."""
    return (u8.astype(np.float32) / 255.0) * 2.0 - 1.0


def load_cifar10(root: str, train: bool = True,
                 subset_ratio: Optional[float] = None,
                 seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Load CIFAR-10 from the standard `cifar-10-batches-py` layout (or the
    .tar.gz alongside). Returns (images [N,32,32,3] in [-1,1], labels [N])."""
    base = os.path.join(root, "cifar-10-batches-py")
    if not os.path.isdir(base):
        tgz = os.path.join(root, "cifar-10-python.tar.gz")
        if os.path.isfile(tgz):
            with tarfile.open(tgz) as tf:
                tf.extractall(root)
    if not os.path.isdir(base):
        raise FileNotFoundError(
            f"CIFAR-10 not found under {root!r}; expected "
            "cifar-10-batches-py/ or cifar-10-python.tar.gz (no network "
            "download in this environment)")

    files = ([f"data_batch_{i}" for i in range(1, 6)] if train
             else ["test_batch"])
    xs, ys = [], []
    for f in files:
        with open(os.path.join(base, f), "rb") as fh:
            d = pickle.load(fh, encoding="bytes")
        xs.append(d[b"data"])
        ys.append(np.asarray(d[b"labels"]))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    y = np.concatenate(ys)
    x = _to_unit_interval(x)
    if subset_ratio is not None and subset_ratio < 1.0:
        n = max(1, int(len(x) * subset_ratio))
        idx = np.random.default_rng(seed).permutation(len(x))[:n]
        x, y = x[idx], y[idx]
    return x, y.astype(np.int32)


def load_image_folder(root: str, img_size: int = 256,
                      subset_ratio: Optional[float] = None,
                      seed: int = 0,
                      max_images: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Class-per-subdirectory image tree -> arrays (resize + center crop,
    mirroring the reference's transforms at `Train.py:452-467`)."""
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise ImportError("ImageFolderDataset needs PIL") from e

    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    paths, labels = [], []
    for ci, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp")):
                paths.append(os.path.join(cdir, f))
                labels.append(ci)
    paths = np.asarray(paths)
    labels = np.asarray(labels, dtype=np.int32)
    if subset_ratio is not None and subset_ratio < 1.0:
        n = max(1, int(len(paths) * subset_ratio))
        idx = np.random.default_rng(seed).permutation(len(paths))[:n]
        paths, labels = paths[idx], labels[idx]
    if max_images is not None:
        paths, labels = paths[:max_images], labels[:max_images]

    imgs = np.empty((len(paths), img_size, img_size, 3), dtype=np.float32)
    for i, p in enumerate(paths):
        im = Image.open(p).convert("RGB")
        # resize shorter side then center crop
        w, h = im.size
        scale = img_size / min(w, h)
        im = im.resize((max(img_size, int(round(w * scale))),
                        max(img_size, int(round(h * scale)))))
        w, h = im.size
        left, top = (w - img_size) // 2, (h - img_size) // 2
        im = im.crop((left, top, left + img_size, top + img_size))
        imgs[i] = _to_unit_interval(np.asarray(im, dtype=np.uint8))
    return imgs, labels


def _put_batch(batch, sharding):
    """device_put every value of a batch dict (sharded when given) —
    shared by both prefetch variants so the transfer policy cannot
    diverge between them. ``sharding`` may be a single Sharding for all
    keys, or a dict key->Sharding (spatial partitioning shards images on
    H but labels only on batch)."""
    import jax

    if sharding is None:
        return {k: jax.device_put(v) for k, v in batch.items()}
    if isinstance(sharding, dict):
        return {k: jax.device_put(v, sharding[k]) for k, v in batch.items()}
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator with device prefetch: the next `size`
    batches are already transferred (and sharded) while the current step
    computes — hides host->HBM latency the way the reference's DataLoader
    workers hide disk latency (`Train.py:512-514`), but for the PCIe leg."""
    import collections

    queue = collections.deque()

    def put(batch):
        queue.append(_put_batch(batch, sharding))

    it = iter(iterator)
    try:
        for _ in range(size):
            put(next(it))
    except StopIteration:
        pass
    while queue:
        try:
            put(next(it))
        except StopIteration:
            pass
        yield queue.popleft()


def threaded_prefetch(iterator, size: int = 2, sharding=None):
    """Like `prefetch_to_device`, but the host side of the pipeline (batch
    assembly, augmentation, the numpy->device_put handoff) runs on a
    producer thread, so it overlaps with the training step's Python
    dispatch — the TPU-native answer to the reference's DataLoader worker
    processes (`Train.py:512-514`). `jax.device_put` is thread-safe and
    async, so the HBM transfer itself also overlaps device compute.

    Exceptions in the producer propagate to the consumer. If the consumer
    stops iterating early (break / exception / GC of the generator), the
    generator's finally block signals the producer to stop and drains the
    queue, so no thread is left blocked on a full queue pinning
    device-resident batches.
    """
    import queue as queue_mod
    import threading

    q = queue_mod.Queue(maxsize=max(1, size))
    _END = object()
    stop = threading.Event()

    def put_guarded(item):
        """Blocking put that aborts when the consumer signalled stop —
        never leaves the thread parked on a full queue. Re-checks stop
        AFTER a successful put: the consumer's teardown drain can free a
        slot, and a put that sneaks in then would have built one more
        device batch into the abandoned queue."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return not stop.is_set()
            except queue_mod.Full:
                continue
        return False

    def produce():
        try:
            for batch in iterator:
                if not put_guarded(_put_batch(batch, sharding)):
                    return
            put_guarded(_END)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            put_guarded(e)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue_mod.Empty:
            pass
        # the producer sees stop within its 0.1 s put timeout; join so the
        # thread (and any device batch it holds) is actually gone
        t.join(timeout=2.0)


def synthetic_dataset(n: int = 256, img_size: int = 32, num_labels: int = 10,
                      seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic random data (smooth blobs, not white noise) for tests
    and benchmarks."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, img_size // 4, img_size // 4, 3))
    imgs = np.repeat(np.repeat(base, 4, axis=1), 4, axis=2)
    imgs = np.tanh(imgs).astype(np.float32)
    labels = rng.integers(0, num_labels, size=n).astype(np.int32)
    return imgs, labels


def shapes_dataset(n: int = 10000, img_size: int = 32, num_labels: int = 10,
                   seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Procedurally generated class-structured images: 10 classes =
    {circle, square, triangle, ring, cross} x 2 hue families, with jittered
    position/scale/hue and textured background.

    This is the self-contained stand-in for CIFAR-10 in environments with no
    dataset on disk (BASELINE.md workloads need a *learnable* distribution
    with class structure so a classifier verifier is meaningful — the
    upsampled-noise `synthetic_dataset` has neither).
    Returns (images [N,S,S,3] float32 in [-1,1], labels [N] int32).
    """
    rng = np.random.default_rng(seed)
    S = img_size
    yy, xx = np.mgrid[0:S, 0:S].astype(np.float32)
    # base hue per class family (RGB in [0,1]); 2 families x 5 shapes
    family_rgb = np.array([[0.9, 0.25, 0.2], [0.2, 0.45, 0.95]], np.float32)

    imgs = np.empty((n, S, S, 3), dtype=np.float32)
    labels = rng.integers(0, num_labels, size=n).astype(np.int32)
    for i in range(n):
        lab = labels[i]
        shape_kind = lab % 5
        fam = lab // 5
        cx = S / 2 + rng.uniform(-S / 8, S / 8)
        cy = S / 2 + rng.uniform(-S / 8, S / 8)
        r = S * rng.uniform(0.22, 0.34)
        dx, dy = xx - cx, yy - cy
        if shape_kind == 0:      # circle
            mask = (dx ** 2 + dy ** 2) <= r ** 2
        elif shape_kind == 1:    # square
            mask = (np.abs(dx) <= r * 0.85) & (np.abs(dy) <= r * 0.85)
        elif shape_kind == 2:    # triangle (upward)
            mask = (dy >= -r) & (dy <= r) & \
                   (np.abs(dx) <= (dy + r) * 0.6)
        elif shape_kind == 3:    # ring
            rho = dx ** 2 + dy ** 2
            mask = (rho <= r ** 2) & (rho >= (0.55 * r) ** 2)
        else:                    # cross
            mask = (np.abs(dx) <= r * 0.3) | (np.abs(dy) <= r * 0.3)
            mask &= (np.abs(dx) <= r) & (np.abs(dy) <= r)
        color = np.clip(
            family_rgb[fam] + rng.uniform(-0.12, 0.12, 3), 0.0, 1.0)
        bg = 0.45 + 0.1 * rng.standard_normal((S, S, 1)).astype(np.float32)
        bg = np.clip(bg + rng.uniform(-0.15, 0.15), 0.0, 1.0)
        img = np.broadcast_to(bg, (S, S, 3)).copy()
        img[mask] = color
        imgs[i] = img * 2.0 - 1.0
    return imgs, labels
