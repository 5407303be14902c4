"""Host-side image transforms (numpy/cv2).

Re-implementation of the reference transform kit — the one copy replacing its
two (distillanydepth/depth_anything_v2/util/transform.py and
distillanydepth/midas/transforms.py, byte-similar). Host code stays minimal:
decode + resize + normalize; everything downstream runs on device.

``Resize.get_size`` reproduces the reference's sizing rules exactly
(transform.py:51-107): keep-aspect lower_bound/upper_bound/minimal methods and
``constrain_to_multiple_of`` with round-then-floor/ceil fixups — NYU metric
parity depends on these.
"""
from __future__ import annotations

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in CI; keep importable
    cv2 = None

__all__ = ["Resize", "NormalizeImage", "PrepareForNet", "Compose",
           "apply_min_size", "IMAGENET_MEAN", "IMAGENET_STD"]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample: dict) -> dict:
        for t in self.transforms:
            sample = t(sample)
        return sample


def apply_min_size(sample: dict, size: tuple[int, int],
                   image_interpolation_method=None):
    """Upscale ``sample`` in place so ``disparity`` is at least ``size``
    (rows, cols), keeping aspect ratio; no-op when already large enough.

    Completes the midas-transform superset (the only live piece of
    distillanydepth/midas/transforms.py:6-45 not otherwise carried by this
    kit). The reference's return contract is odd and preserved verbatim:
    the *sample dict* when no resize happens, else the new ``(rows, cols)``
    tuple — callers there mutate the dict and ignore the return.
    """
    shape = list(sample["disparity"].shape)
    if shape[0] >= size[0] and shape[1] >= size[1]:
        return sample

    if image_interpolation_method is None and cv2 is not None:
        image_interpolation_method = cv2.INTER_AREA
    scale = max(size[0] / shape[0], size[1] / shape[1])
    shape[0] = int(np.ceil(scale * shape[0]))
    shape[1] = int(np.ceil(scale * shape[1]))

    sample["image"] = cv2.resize(
        sample["image"], tuple(shape[::-1]),
        interpolation=image_interpolation_method,
    )
    sample["disparity"] = cv2.resize(
        sample["disparity"], tuple(shape[::-1]), interpolation=cv2.INTER_NEAREST
    )
    sample["mask"] = cv2.resize(
        sample["mask"].astype(np.float32),
        tuple(shape[::-1]),
        interpolation=cv2.INTER_NEAREST,
    ).astype(bool)
    return tuple(shape)


class Resize:
    """Resize sample to (width, height) with the reference's sizing rules."""

    def __init__(
        self,
        width: int,
        height: int,
        resize_target: bool = True,
        keep_aspect_ratio: bool = False,
        ensure_multiple_of: int = 1,
        resize_method: str = "lower_bound",
        image_interpolation_method=None,
    ):
        self.width = width
        self.height = height
        self.resize_target = resize_target
        self.keep_aspect_ratio = keep_aspect_ratio
        self.multiple_of = ensure_multiple_of
        self.resize_method = resize_method
        if image_interpolation_method is None and cv2 is not None:
            image_interpolation_method = cv2.INTER_AREA
        self.interp = image_interpolation_method

    def constrain_to_multiple_of(self, x, min_val=0, max_val=None) -> int:
        m = self.multiple_of
        y = int(np.round(x / m) * m)
        if max_val is not None and y > max_val:
            y = int(np.floor(x / m) * m)
        if y < min_val:
            y = int(np.ceil(x / m) * m)
        return y

    def get_size(self, width: int, height: int) -> tuple[int, int]:
        scale_h = self.height / height
        scale_w = self.width / width

        if self.keep_aspect_ratio:
            if self.resize_method == "lower_bound":
                scale_h = scale_w = max(scale_w, scale_h)
            elif self.resize_method == "upper_bound":
                scale_h = scale_w = min(scale_w, scale_h)
            elif self.resize_method == "minimal":
                pick = scale_w if abs(1 - scale_w) < abs(1 - scale_h) else scale_h
                scale_h = scale_w = pick
            else:
                raise ValueError(f"resize_method {self.resize_method}")

        if self.resize_method == "lower_bound":
            nh = self.constrain_to_multiple_of(scale_h * height, min_val=self.height)
            nw = self.constrain_to_multiple_of(scale_w * width, min_val=self.width)
        elif self.resize_method == "upper_bound":
            nh = self.constrain_to_multiple_of(scale_h * height, max_val=self.height)
            nw = self.constrain_to_multiple_of(scale_w * width, max_val=self.width)
        elif self.resize_method == "minimal":
            nh = self.constrain_to_multiple_of(scale_h * height)
            nw = self.constrain_to_multiple_of(scale_w * width)
        else:
            raise ValueError(f"resize_method {self.resize_method}")
        return (nw, nh)

    def __call__(self, sample: dict) -> dict:
        h, w = sample["image"].shape[:2]
        nw, nh = self.get_size(w, h)
        sample["image"] = cv2.resize(sample["image"], (nw, nh), interpolation=self.interp)
        if self.resize_target:
            if "disparity" in sample:  # midas/transforms.py superset
                sample["disparity"] = cv2.resize(
                    sample["disparity"], (nw, nh), interpolation=cv2.INTER_NEAREST
                )
            if "depth" in sample:
                sample["depth"] = cv2.resize(
                    sample["depth"], (nw, nh), interpolation=cv2.INTER_NEAREST
                )
            if "mask" in sample:
                sample["mask"] = cv2.resize(
                    sample["mask"].astype(np.float32), (nw, nh),
                    interpolation=cv2.INTER_NEAREST,
                )
        return sample


class NormalizeImage:
    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, sample: dict) -> dict:
        sample["image"] = (sample["image"] - self.mean) / self.std
        return sample


class PrepareForNet:
    """Finalize dtype/contiguity. NHWC stays NHWC (TPU layout) — the
    reference's CHW transpose (transform.py:147) is a torch-ism we drop;
    callers batch with a leading axis."""

    def __call__(self, sample: dict) -> dict:
        sample["image"] = np.ascontiguousarray(sample["image"], dtype=np.float32)
        for key in ("depth", "disparity", "mask"):
            if key in sample:
                sample[key] = np.ascontiguousarray(sample[key], dtype=np.float32)
        return sample


def standard_transform(
    size: int,
    keep_aspect_ratio: bool = False,
    resize_method: str = "lower_bound",
    multiple_of: int = 14,
) -> Compose:
    """The inference/teacher preprocessing chain
    (tools/testers/infer.py:172-177: Resize + ImageNet normalize)."""
    return Compose(
        [
            Resize(
                size,
                size,
                resize_target=False,
                keep_aspect_ratio=keep_aspect_ratio,
                ensure_multiple_of=multiple_of,
                resize_method=resize_method,
                image_interpolation_method=cv2.INTER_CUBIC if cv2 else None,
            ),
            NormalizeImage(),
            PrepareForNet(),
        ]
    )
