"""Sobel gradient-preservation loss (tools/train_distillation.py:430-446).

Penalizes smooth depth maps: ``mean(exp(-|grad|))`` with Sobel-x/y gradients.
Implemented as a zero-padded depthwise 3x3 conv over ``[B, H, W]`` depth maps.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["gradient_preservation_loss", "sobel_gradients"]

_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_SOBEL_Y = jnp.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], jnp.float32)


def _conv3(depth: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    x = depth[..., None]  # NHWC, C=1
    k = kernel[:, :, None, None].astype(depth.dtype)
    y = lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y[..., 0]


def sobel_gradients(depth: jnp.ndarray):
    return _conv3(depth, _SOBEL_X), _conv3(depth, _SOBEL_Y)


def gradient_preservation_loss(depth: jnp.ndarray) -> jnp.ndarray:
    """depth: [B, H, W] -> scalar mean(exp(-sqrt(gx^2 + gy^2 + 1e-6)))."""
    gx, gy = sobel_gradients(depth)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-6)
    return jnp.mean(jnp.exp(-mag))
