"""Sobel gradient-preservation loss (tools/train_distillation.py:430-446).

Penalizes smooth depth maps: ``mean(exp(-|grad|))`` with Sobel-x/y gradients.

The Sobel stencil is computed as shift-and-add slices over the zero-padded
``[B, H, W]`` map, exploiting separability (sobel_x = [1,2,1]^T (x) [-1,0,1],
sobel_y its transpose) — NOT as a conv: a C_in=C_out=1 conv at [16,392,392,1]
cannot tile onto the MXU and XLA lowers it at a T(1,128) layout that cost
~24 ms fwd+bwd of the distillation step (xprof/HLO estimated_cycles, v5e);
the slice form is a pure VPU elementwise pass, bandwidth-bound, and its
backward is the same-shape transposed stencil.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["gradient_preservation_loss", "sobel_gradients"]


def sobel_gradients(depth: jnp.ndarray):
    """Sobel-x/y of ``[..., H, W]`` with zero padding; bit-compatible with the
    cross-correlation conv form up to float summation order."""
    pad = [(0, 0)] * (depth.ndim - 2) + [(1, 1), (1, 1)]
    p = jnp.pad(depth, pad)
    # [1,2,1] smoothing over H, W kept padded for the x-difference
    sv = p[..., :-2, :] + 2.0 * p[..., 1:-1, :] + p[..., 2:, :]  # [B,H,W+2]
    gx = sv[..., :, 2:] - sv[..., :, :-2]
    # [1,2,1] smoothing over W, H kept padded for the y-difference
    sh = p[..., :, :-2] + 2.0 * p[..., :, 1:-1] + p[..., :, 2:]  # [B,H+2,W]
    gy = sh[..., 2:, :] - sh[..., :-2, :]
    return gx, gy


def gradient_preservation_loss(depth: jnp.ndarray) -> jnp.ndarray:
    """depth: [B, H, W] -> scalar mean(exp(-sqrt(gx^2 + gy^2 + 1e-6)))."""
    gx, gy = sobel_gradients(depth)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-6)
    return jnp.mean(jnp.exp(-mag))
