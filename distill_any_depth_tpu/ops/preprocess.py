"""Device-side image preprocessing.

The reference preprocesses on the host with cv2/PIL per image (SURVEY.md §3.2
host->device boundary). Here decoded uint8 images go to the device raw and
resize + ImageNet normalization run as XLA ops fused into the forward program
— the host does IO only.

Resolution bucketing: XLA requires static shapes, so free-form
``processing_res`` values (reference scripts use 0/392/518/700) are snapped
to a bucket grid of multiple-of-14 sizes. One compiled program per bucket,
reused across images.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from distill_any_depth_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from distill_any_depth_tpu.ops.resize import resize_2d

__all__ = ["DEFAULT_BUCKETS", "snap_to_bucket", "preprocess_on_device"]

# multiple-of-14 buckets covering the reference's operating points
DEFAULT_BUCKETS = (196, 266, 392, 518, 700, 924)


def snap_to_bucket(size: int, buckets=DEFAULT_BUCKETS) -> int:
    """Smallest bucket >= size (largest bucket if none)."""
    for b in buckets:
        if b >= size:
            return b
    return buckets[-1]


def preprocess_on_device(
    images: jnp.ndarray,
    target: int,
    normalize: bool = True,
    method: str = "bicubic",
    dtype=jnp.float32,
) -> jnp.ndarray:
    """uint8/float ``[B, H, W, 3]`` -> normalized ``[B, target, target, 3]``.

    Matches the NYU pipeline semantics (square resize + /255 + ImageNet
    normalize) with the resize running on the MXU (ops/resize matrices).
    Float inputs are assumed already scaled to [0, 1].
    """
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    x = resize_2d(x, (target, target), method=method, align_corners=False)
    if normalize:
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        x = (x - mean) / std
    return x.astype(dtype)
