"""Torch-compatible separable image resizing as matrix multiplications.

TPU-first design: instead of gather-based interpolation (which maps poorly to
the MXU and forces XLA into scatter/gather lowering), every resize is expressed
as two small dense matmuls ``y = R_h @ x @ R_w^T`` whose weight matrices are
computed **at trace time** with numpy (shapes are static under jit). XLA
constant-folds the matrices and the whole resize runs on the MXU fused with
neighbouring ops.

The weight construction reproduces PyTorch's ``F.interpolate`` coordinate
semantics exactly (the reference depends on them everywhere):

- ``bilinear`` / ``align_corners=True``  — DPT fusion upsampling
  (reference: distillanydepth/depth_anything_v2/util/blocks.py:144,
  dpt.py:181).
- ``bilinear`` / ``align_corners=False`` — misc feature resizes
  (reference: tools/train_distillation.py:326-340).
- ``bicubic``  / ``align_corners=False`` with an explicit ``scale`` override —
  DINOv2 positional-embedding interpolation, which passes ``scale_factor``
  rather than an output size (reference:
  distillanydepth/depth_anything_v2/dinov2.py:199-205).
- ``nearest`` — depth-target and 1-D channel resizes
  (reference: tools/train_distillation.py:329 'nearest' mode for 3-D tensors).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Resize matmuls are tiny relative to the model but feed parity-sensitive
# paths (pos-embeds, depth upsampling). fp32 inputs run at HIGHEST precision
# (bit-matching torch); bf16 inputs take the fast single-pass MXU path —
# the data is already quantized to bf16, so extra fp32 passes buy nothing.
def _precision_for(dtype) -> jax.lax.Precision:
    return (
        jax.lax.Precision.DEFAULT
        if jnp.dtype(dtype) == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

__all__ = [
    "resize_matrix",
    "resize_2d",
    "resize_2d_packed",
    "resize_1d",
    "interpolate",
]


def _cubic_weight(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel with PyTorch's a=-0.75 (not Keys' -0.5)."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
        np.where(ax < 2.0, (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def resize_matrix(
    in_size: int,
    out_size: int,
    method: str = "bilinear",
    align_corners: bool = False,
    scale: float | None = None,
) -> np.ndarray:
    """Build a dense ``[out_size, in_size]`` interpolation matrix.

    ``scale`` overrides the coordinate-mapping scale for align_corners=False
    modes, matching ``F.interpolate(scale_factor=...)`` where the *given*
    scale factor (not out/in) drives the source-coordinate computation.
    """
    if method == "nearest":
        # torch 'nearest': src = floor(dst * in/out)
        src = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
        src = np.clip(src, 0, in_size - 1)
        m = np.zeros((out_size, in_size), dtype=np.float32)
        m[np.arange(out_size), src] = 1.0
        return m

    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros_like(dst)
        else:
            src = dst * (in_size - 1) / (out_size - 1)
    else:
        s = (in_size / out_size) if scale is None else (1.0 / scale)
        src = (dst + 0.5) * s - 0.5

    m = np.zeros((out_size, in_size), dtype=np.float64)
    if method == "bilinear":
        if not align_corners:
            # torch clamps the *source coordinate* to >= 0 for linear modes
            src = np.maximum(src, 0.0)
        i0 = np.floor(src).astype(np.int64)
        frac = src - i0
        i0 = np.clip(i0, 0, in_size - 1)
        i1 = np.clip(i0 + 1, 0, in_size - 1)
        np.add.at(m, (np.arange(out_size), i0), 1.0 - frac)
        np.add.at(m, (np.arange(out_size), i1), frac)
    elif method == "bicubic":
        # torch does NOT clamp the source coordinate for cubic; taps are
        # border-clamped instead.
        i = np.floor(src).astype(np.int64)
        t = src - i
        taps = np.stack([i - 1, i, i + 1, i + 2], axis=1)  # [out, 4]
        w = np.stack(
            [
                _cubic_weight(t + 1.0),
                _cubic_weight(t),
                _cubic_weight(1.0 - t),
                _cubic_weight(2.0 - t),
            ],
            axis=1,
        )  # [out, 4]
        taps = np.clip(taps, 0, in_size - 1)
        for k in range(4):
            np.add.at(m, (np.arange(out_size), taps[:, k]), w[:, k])
    else:
        raise ValueError(f"unknown resize method: {method}")
    return m.astype(np.float32)


def resize_2d(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
    scale: tuple[float, float] | None = None,
) -> jnp.ndarray:
    """Resize ``[..., H, W, C]`` (NHWC-style, channels last) to ``out_hw``."""
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (oh, ow) == (h, w) and scale is None:
        return x
    sh, sw = scale if scale is not None else (None, None)
    mh = jnp.asarray(resize_matrix(h, oh, method, align_corners, sh), dtype=x.dtype)
    mw = jnp.asarray(resize_matrix(w, ow, method, align_corners, sw), dtype=x.dtype)
    prec = _precision_for(x.dtype)
    y = jnp.einsum("Hh,...hwc->...Hwc", mh, x, precision=prec)
    y = jnp.einsum("Ww,...hwc->...hWc", mw, y, precision=prec)
    return y


@functools.lru_cache(maxsize=64)
def _packed_resize_matrix(
    in_size: int, out_size: int, method: str, align_corners: bool
) -> np.ndarray:
    """``resize_matrix`` rows shifted down by 1 and zero-padded to
    ``out_size + 2`` rows (pixels -1..out_size) — the exact halo a
    following 3x3/s1 conv's phase-packed 2x2 form reads (output block m
    covers padded pixels 2m-1..2m+2, so the last block needs one pixel
    past the end) — folded ``[blocks, 2, in]`` for space-to-depth
    emission. A VALID 2x2 conv over the ``out/2 + 1`` blocks yields
    exactly ``out/2`` output blocks, no crop needed."""
    assert out_size % 2 == 0, "packed resize needs an even output size"
    m = resize_matrix(in_size, out_size, method, align_corners)
    mp = np.zeros((out_size + 2, in_size), np.float32)
    mp[1 : 1 + out_size] = m
    return mp.reshape(out_size // 2 + 1, 2, in_size)


def resize_2d_packed(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
    packed_input: bool = False,
) -> jnp.ndarray:
    """Resize ``[..., H, W, C]`` and emit the padded space-to-depth layout
    ``[..., oh//2 + 1, ow//2 + 1, 2, 2, C]`` directly.

    Block ``(i, j)`` phase ``(a, p)`` holds padded-resized pixel
    ``(2i + a - 1, 2j + p - 1)`` (zero outside ``[0, oh) x [0, ow)``) — the
    exact input blocking under which a 3x3/s1 conv's phase-packed 4x4/s2
    form (``models/dpt.FusedConv3x3``) collapses to a 2x2/s1 VALID conv.
    Skipping the ``[..., oh, ow, C]`` intermediate keeps the whole DPT tail
    on aligned GEMMs: 1.29x over resize-then-conv at the 224->392 bs8 point
    (scripts/profile_packed_tail.py).

    With ``packed_input`` the source is itself a *pure* (halo-less)
    space-to-depth tensor ``[..., h/2, w/2, 2, 2, C]`` — block ``(i, a)``
    holding pixel ``2i + a`` — as produced by a phase-packed conv
    (``FusedConv3x3(keep_phases=True)``); the resize matrices fold the input
    blocking too, so packed stages chain without any depth-to-space
    relayout in between.
    """
    oh, ow = out_hw
    prec = _precision_for(x.dtype)
    if packed_input:
        h, w = 2 * x.shape[-5], 2 * x.shape[-4]
        mh = jnp.asarray(_packed_resize_matrix(h, oh, method, align_corners), x.dtype)
        mw = jnp.asarray(_packed_resize_matrix(w, ow, method, align_corners), x.dtype)
        mh = mh.reshape(mh.shape[0], 2, h // 2, 2)
        mw = mw.reshape(mw.shape[0], 2, w // 2, 2)
        y = jnp.einsum("MAia,...ijapc->...MjApc", mh, x, precision=prec)
        y = jnp.einsum("NPjp,...MjApc->...MNAPc", mw, y, precision=prec)
        return y
    h, w = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(_packed_resize_matrix(h, oh, method, align_corners), x.dtype)
    mw = jnp.asarray(_packed_resize_matrix(w, ow, method, align_corners), x.dtype)
    y = jnp.einsum("mah,...hwc->...mawc", mh, x, precision=prec)
    y = jnp.einsum("npw,...mawc->...mnapc", mw, y, precision=prec)
    return y


def resize_1d(
    x: jnp.ndarray,
    out_size: int,
    method: str = "nearest",
    align_corners: bool = False,
    axis: int = -1,
) -> jnp.ndarray:
    """Resize one axis of ``x`` to ``out_size`` (torch 1-D interpolate)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(
        resize_matrix(in_size, out_size, method, align_corners), dtype=x.dtype
    )
    x_moved = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum("Oi,...i->...O", m, x_moved, precision=_precision_for(x.dtype))
    return jnp.moveaxis(y, -1, axis)


def interpolate(
    x: jnp.ndarray,
    size: tuple[int, int],
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Convenience wrapper mirroring ``F.interpolate`` for NHWC inputs."""
    return resize_2d(x, size, method=mode, align_corners=align_corners)
