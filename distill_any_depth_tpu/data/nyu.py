"""NYU-Depth-V2 dataset (CSV-driven RGB/depth pairs).

Torch-free re-implementation of tools/data_loaders.py:12-191: CSV rows of
(rgb_path, depth_path), square resize to the target size (INTER_CUBIC for RGB,
INTER_NEAREST for depth), uint8 depth /255 (train) vs uint16 /65535 (test),
and bounded random-retry on corrupt files.

Intentional fix (documented reference quirk): the reference's transform chain
silently *fails* on NYU tensors and feeds raw 0-255 images to the network
(data_loaders.py:141-150 catches the exception). Here images are normalized
with ImageNet statistics by default; pass ``raw_255=True`` to reproduce the
reference behavior bit-for-bit for trajectory-parity experiments.

Output layout is NHWC float32 numpy. ``iterate_batches`` shards the epoch
round-robin across processes (multi-host DP does no duplicate work, every
shard yields the same step count) and prefetches decoded batches on a
background thread so host IO overlaps device compute — the same contract as
the native C++ loader (native/dad_loader.cpp).
"""
from __future__ import annotations

import csv
import os
from dataclasses import dataclass

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from distill_any_depth_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

__all__ = ["NYUDataset", "iterate_batches", "epoch_order"]


def epoch_order(
    indices,
    seed: int = 0,
    shuffle: bool = True,
    shard_index: int = 0,
    num_shards: int = 1,
) -> np.ndarray:
    """THE epoch ordering policy, shared by the Python and native loaders:
    seeded global shuffle (host-consistent) first, THEN round-robin shard,
    truncated so every shard is the same length (unequal step counts
    deadlock SPMD collectives). ``indices`` is an index list or a count."""
    idx = np.array(
        np.arange(indices) if np.isscalar(indices) else indices, dtype=np.int64
    )
    if shuffle:
        np.random.RandomState(seed).shuffle(idx)
    if num_shards > 1:
        per = len(idx) // num_shards
        idx = idx[shard_index::num_shards][:per]
    return idx


@dataclass
class NYUSample:
    image: np.ndarray  # [H, W, 3] float32 (uint8 native-res when device_preprocess)
    depth: np.ndarray  # [H, W] float32 in [0, 1]
    rgb_path: str


class NYUDataset:
    def __init__(
        self,
        mode: str,
        dataset_dir: str = "data/nyu",
        image_size: int = 392,
        raw_255: bool = False,
        root_dir: str | None = None,
        max_attempts: int = 10,
        device_preprocess: bool = False,
    ):
        """``device_preprocess=True`` skips the host-side RGB resize +
        normalize: samples carry the decoded uint8 image at its NATIVE
        resolution (all rows in a batch must share it — true for NYU's
        uniform 640x480) and the consumer runs
        ops/preprocess.preprocess_on_device inside the jitted step. Depth is
        still nearest-resized to ``image_size`` on host (cheap, and unused
        by the distillation step)."""
        self.mode = mode
        self.image_size = image_size
        self.raw_255 = raw_255
        self.device_preprocess = device_preprocess
        self.root = os.path.abspath(root_dir or os.getcwd())
        self.max_attempts = max_attempts

        csv_name = f"nyu2_{mode}.csv"
        candidates = [
            os.path.join(dataset_dir, csv_name),
            os.path.join("data", csv_name),
            csv_name,
        ]
        csv_path = next((p for p in candidates if os.path.exists(p)), None)
        if csv_path is None:
            raise FileNotFoundError(f"CSV not found in any of {candidates}")
        with open(csv_path) as f:
            self.pairs = [row for row in csv.reader(f) if row]

    def __len__(self) -> int:
        return len(self.pairs)

    def _load(self, index: int) -> NYUSample:
        rgb_rel, depth_rel = self.pairs[index][0], self.pairs[index][1]
        rgb_path = os.path.join(self.root, rgb_rel)
        depth_path = os.path.join(self.root, depth_rel)

        rgb = cv2.imread(rgb_path)
        if rgb is None:
            raise FileNotFoundError(rgb_path)
        rgb = cv2.cvtColor(rgb, cv2.COLOR_BGR2RGB)
        if not self.device_preprocess:
            rgb = cv2.resize(
                rgb, (self.image_size, self.image_size),
                interpolation=cv2.INTER_CUBIC,
            ).astype(np.float32)

        depth = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
        if depth is None:
            raise FileNotFoundError(depth_path)
        depth = cv2.resize(
            depth, (self.image_size, self.image_size), interpolation=cv2.INTER_NEAREST
        )
        if depth.dtype == np.uint16:
            depth = depth.astype(np.float32) / 65535.0
        else:
            depth = depth.astype(np.float32) / 255.0
        if depth.ndim == 3:
            depth = depth[..., 0]

        if self.device_preprocess:
            image = rgb  # native-res uint8; resize + normalize run on device
        elif self.raw_255:
            image = rgb  # reference quirk: unnormalized 0-255 floats
        else:
            image = (rgb / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return NYUSample(image=image, depth=depth, rgb_path=rgb_rel)

    def __getitem__(self, idx: int) -> NYUSample:
        rng = np.random.RandomState(idx)
        index = idx
        last_err: Exception | None = None
        for attempt in range(self.max_attempts):
            try:
                return self._load(index)
            except Exception as e:  # corrupt file -> bounded random retry
                last_err = e
                index = int(rng.randint(0, len(self.pairs)))
        raise RuntimeError(
            f"failed to load a valid sample after {self.max_attempts} attempts"
        ) from last_err


def iterate_batches(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_remainder: bool = True,
    indices: list[int] | None = None,
    shard_index: int = 0,
    num_shards: int = 1,
    prefetch: int = 2,
):
    """Yield dict batches {'image': [B,H,W,3], 'depth': [B,H,W]}.

    Multi-host: ``shard_index``/``num_shards`` round-robin split the (seeded,
    hence host-consistent) global order, truncated so every shard yields the
    SAME number of batches (unequal counts deadlock SPMD collectives).

    ``prefetch`` > 0 decodes that many batches ahead on a daemon thread, so
    host IO overlaps device compute (matching the native C++ loader's
    behavior); 0 disables for deterministic single-thread tests.
    """
    idx = epoch_order(
        indices if indices is not None else len(dataset),
        seed=seed, shuffle=shuffle,
        shard_index=shard_index, num_shards=num_shards,
    )
    n = (len(idx) // batch_size) * batch_size if drop_remainder else len(idx)

    def produce():
        for start in range(0, n, batch_size):
            chunk = [dataset[int(i)] for i in idx[start : start + batch_size]]
            yield {
                "image": np.stack([s.image for s in chunk]),
                "depth": np.stack([s.depth for s in chunk]),
                "rgb_path": [s.rgb_path for s in chunk],
            }

    if prefetch <= 0:
        yield from produce()
        return

    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()
    sentinel = object()
    errors: list[BaseException] = []

    def worker():
        try:
            for b in produce():
                # bounded put with a stop check: an abandoned consumer must
                # not leave the thread blocked holding decoded batches
                while not stop.is_set():
                    try:
                        q.put(b, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface decode errors to the consumer
            errors.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True, name="nyu-prefetch")
    t.start()
    try:
        while True:
            b = q.get()
            if b is sentinel:
                if errors:
                    raise errors[0]
                return
            yield b
    finally:
        stop.set()
