"""Depth visualization and misc image utilities.

Covers the load-bearing pieces of the reference's utils/image_util.py:
``colorize_depth_maps`` (:69-121, matplotlib Spectral_r colormap used by
inference) and ``chw2hwc`` (:124), plus min-max disparity normalization.
"""
from __future__ import annotations

import numpy as np

__all__ = ["colorize_depth_maps", "chw2hwc", "normalize_disparity"]


def colorize_depth_maps(
    depth_map,
    min_depth: float,
    max_depth: float,
    cmap: str = "Spectral_r",
    valid_mask=None,
) -> np.ndarray:
    """Colorize depth as [B, 3, H, W] float in [0, 1].

    Accepts [H,W], [B,H,W], or [B,1,H,W] arrays (numpy or jax).
    """
    import matplotlib

    depth = np.asarray(depth_map).astype(np.float32)
    if depth.ndim == 2:
        depth = depth[None]
    elif depth.ndim == 4:
        depth = depth[:, 0]
    assert depth.ndim == 3

    cm = matplotlib.colormaps[cmap]
    span = max(max_depth - min_depth, 1e-8)
    norm = np.clip((depth - min_depth) / span, 0, 1)
    img_colored_np = cm(norm, bytes=False)[:, :, :, 0:3]  # [B,H,W,3]

    if valid_mask is not None:
        valid = np.asarray(valid_mask, bool)
        if valid.ndim == 2:
            valid = valid[None]
        elif valid.ndim == 4:
            valid = valid[:, 0]
        img_colored_np[~valid] = 0

    return np.rollaxis(img_colored_np, 3, 1)  # [B,3,H,W]


def chw2hwc(chw: np.ndarray) -> np.ndarray:
    return np.moveaxis(np.asarray(chw), 0, -1)


def normalize_disparity(disp: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0,1] (tools/testers/infer.py:137)."""
    disp = np.asarray(disp, np.float32)
    span = disp.max() - disp.min()
    return (disp - disp.min()) / (span + 1e-8)
