"""Unlabeled image-folder dataset for paper-style distillation.

Re-implementation of the reference ImageDataset
(tools/train_distillation.py:88-169): recursive jpg/png glob, an
aspect-keeping global resize (multiple of the patch size), and a random
square local crop taken *from the transformed global image* with its
coordinates returned — the local/global pair drives the LG loss.

The local crop here is resized to a fixed ``local_size`` on the host so that
batches have static shapes (XLA requirement); the reference instead emitted
ragged crops and fell into a degenerate per-image optimizer path
(train_distillation.py:1396-1485) — the static-shape design is the TPU fix
for that perf bug flagged in SURVEY.md §3.1.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from glob import glob

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from distill_any_depth_tpu.data.transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    Resize,
)

__all__ = ["ImageFolderDataset"]


@dataclass
class ImagePairSample:
    global_image: np.ndarray  # [Hg, Wg, 3] normalized float32
    local_image: np.ndarray  # [Hl, Wl, 3] normalized float32
    crop_box: tuple[int, int, int, int]  # (left, top, right, bottom)
    image_path: str


class ImageFolderDataset:
    def __init__(
        self,
        image_dir: str,
        global_size: int = 560,
        local_size: int = 560,
        min_local_crop: int = 384,
        seed: int = 0,
        image_paths: list[str] | None = None,
        square_global: bool = True,
    ):
        if image_paths is None:
            image_paths = sorted(
                glob(os.path.join(image_dir, "**/*.jpg"), recursive=True)
                + glob(os.path.join(image_dir, "**/*.png"), recursive=True)
            )
        if not image_paths:
            raise ValueError(f"no images found in {image_dir}")
        self.image_paths = image_paths
        self.global_size = global_size
        self.local_size = local_size
        self.min_local_crop = min_local_crop
        # Static shapes for XLA: the local crop is taken from the aspect-kept
        # global image (reference semantics) and then both views are resized
        # to fixed squares, avoiding the reference's ragged-batch degenerate
        # path (train_distillation.py:1388-1485).
        self.square_global = square_global
        self.rng = np.random.RandomState(seed)
        self.global_resize = Resize(
            global_size,
            global_size,
            resize_target=False,
            keep_aspect_ratio=True,
            ensure_multiple_of=14,
            resize_method="lower_bound",
            image_interpolation_method=cv2.INTER_CUBIC if cv2 else None,
        )

    def __len__(self) -> int:
        return len(self.image_paths)

    def __getitem__(self, idx: int) -> ImagePairSample:
        path = self.image_paths[idx % len(self.image_paths)]
        img = cv2.imread(path)
        if img is None:
            # degrade to the next index like the reference (:159-169)
            return self.__getitem__((idx + 1) % len(self.image_paths))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

        g = self.global_resize({"image": img})["image"]
        gh, gw = g.shape[:2]

        min_crop = max(64, min(self.min_local_crop, gh - 2, gw - 2))
        max_crop = min(gh, gw)
        # unlike the reference, stay valid for small global sizes
        min_crop = min(min_crop, max_crop)
        crop = int(self.rng.randint(min_crop, max_crop + 1))
        left = int(self.rng.randint(0, max(0, gw - crop) + 1))
        top = int(self.rng.randint(0, max(0, gh - crop) + 1))
        right, bottom = min(left + crop, gw), min(top + crop, gh)

        local = g[top:bottom, left:right]
        local = cv2.resize(
            local, (self.local_size, self.local_size), interpolation=cv2.INTER_CUBIC
        )
        if self.square_global:
            g = cv2.resize(
                g, (self.global_size, self.global_size),
                interpolation=cv2.INTER_CUBIC,
            )

        norm = lambda a: ((a - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)  # noqa: E731
        return ImagePairSample(
            global_image=norm(g),
            local_image=norm(local),
            crop_box=(left, top, right, bottom),
            image_path=path,
        )
