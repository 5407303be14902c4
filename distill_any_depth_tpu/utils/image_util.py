"""Depth visualization and misc image utilities.

Covers the reference's utils/image_util.py surface: ``colorize_depth_maps``
(:69-121, matplotlib Spectral_r colormap used by inference), ``chw2hwc``
(:124), min-max disparity normalization (:313-335), PFM I/O (:11), and
depth -> point-cloud + PLY export (:222-312).
"""
from __future__ import annotations

import re

import numpy as np

__all__ = [
    "colorize_depth_maps",
    "chw2hwc",
    "normalize_disparity",
    "read_pfm",
    "write_pfm",
    "depth_to_point_cloud",
    "write_ply",
]


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


def read_pfm(path: str) -> tuple[np.ndarray, float]:
    """Read a PFM depth/disparity file -> (array, scale)."""
    with open(path, "rb") as f:
        header = f.readline().decode("latin-1").rstrip()
        if header not in ("PF", "Pf"):
            raise ValueError(f"not a PFM file: {path}")
        color = header == "PF"
        dims = f.readline().decode("latin-1")
        m = re.match(r"^(\d+)\s+(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"malformed PFM dimensions: {dims!r}")
        w, h = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().decode("latin-1").rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    data = data.reshape(shape)
    return np.flipud(data), abs(scale)


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    """Write a float32 array as PFM (little-endian)."""
    image = np.asarray(image, np.float32)
    if image.ndim == 3 and image.shape[2] == 3:
        header = b"PF\n"
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        header = b"Pf\n"
        image = image.reshape(image.shape[0], image.shape[1])
    else:
        raise ValueError(f"unsupported PFM shape {image.shape}")
    with open(path, "wb") as f:
        f.write(header)
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        f.write(f"{-abs(scale)}\n".encode())  # negative = little-endian
        np.flipud(image).astype("<f4").tofile(f)


def depth_to_point_cloud(
    depth: np.ndarray,
    fx: float,
    fy: float,
    cx: float | None = None,
    cy: float | None = None,
    rgb: np.ndarray | None = None,
    mask: np.ndarray | None = None,
):
    """Back-project a depth map through a pinhole model -> [N,3] points
    (+ optional [N,3] colors)."""
    depth = np.asarray(depth, np.float32)
    h, w = depth.shape
    cx = (w - 1) / 2 if cx is None else cx
    cy = (h - 1) / 2 if cy is None else cy
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    z = depth
    x = (xs - cx) * z / fx
    y = (ys - cy) * z / fy
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    colors = None
    if rgb is not None:
        colors = np.asarray(rgb).reshape(-1, 3)
    if mask is not None:
        m = np.asarray(mask, bool).reshape(-1)
        pts = pts[m]
        if colors is not None:
            colors = colors[m]
    return (pts, colors) if colors is not None else (pts, None)


def write_ply(path: str, points: np.ndarray, colors: np.ndarray | None = None) -> None:
    """Write an ASCII PLY point cloud (with optional uint8 colors)."""
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    has_color = colors is not None
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        if has_color:
            c = np.asarray(colors)
            if c.dtype != np.uint8:
                c = np.clip(c * 255 if c.max() <= 1.0 else c, 0, 255).astype(np.uint8)
            for p, col in zip(points, c):
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {col[0]} {col[1]} {col[2]}\n")
        else:
            for p in points:
                f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
