"""Depth-map normalization strategies (global / hybrid / local / none).

Vectorized re-expression of tools/train_distillation.py:173-267. The
reference's per-segment Python loop over ``num_segments`` masks is kept as a
*static* unrolled loop (num_segments is config), with every reduction
batched over the image axis.

Faithfully reproduced quirks (documented, not "fixed", so loss trajectories
match):

- segment boundaries overlap (``>= lo & <= hi``), and later segments
  overwrite earlier ones at shared boundary pixels (:231-247 sequential
  ``torch.where``);
- ``hybrid_normalize`` computes a global normalization and then never uses
  it (:222 dead value) — we simply don't compute it;
- the per-segment statistic called "median" is actually a masked *mean*
  (:240).

API: depth maps are ``[B, H, W]`` (the reference's [B, 1, H, W] with the
channel squeezed).
"""
from __future__ import annotations

import jax.numpy as jnp

from distill_any_depth_tpu.ops.stats import median_all

__all__ = ["global_normalize", "hybrid_normalize", "normalize_depth"]


def global_normalize(depth: jnp.ndarray) -> jnp.ndarray:
    """(d - median) / (mean|d - median| + 1e-6), per image (:173-181)."""
    b = depth.shape[0]
    flat = depth.reshape(b, -1)
    med = median_all(flat)[:, None, None]
    mad = jnp.mean(jnp.abs(depth - med), axis=(1, 2), keepdims=True)
    return (depth - med) / (mad + 1e-6)


def hybrid_normalize(depth: jnp.ndarray, num_segments: int = 4) -> jnp.ndarray:
    """Per-depth-range segment masked mean/MAD normalization (:217-249)."""
    b = depth.shape[0]
    flat = depth.reshape(b, -1)
    dmin = jnp.min(flat, axis=-1)[:, None, None]
    dmax = jnp.max(flat, axis=-1)[:, None, None]
    drange = dmax - dmin

    out = jnp.zeros_like(depth)
    for i in range(num_segments):
        lo = dmin + (i / num_segments) * drange
        hi = dmin + ((i + 1) / num_segments) * drange
        mask = (depth >= lo) & (depth <= hi)
        maskf = mask.astype(depth.dtype)
        seg = jnp.where(mask, depth, 0.0)
        cnt = jnp.sum(maskf, axis=(1, 2), keepdims=True)
        mean = jnp.sum(seg, axis=(1, 2), keepdims=True) / (cnt + 1e-6)
        mad = jnp.sum(jnp.abs(seg - mean) * maskf, axis=(1, 2), keepdims=True) / (cnt + 1e-6)
        seg_norm = (seg - mean) / (mad + 1e-6)
        out = jnp.where(mask, seg_norm, out)
    return out


def normalize_depth(depth: jnp.ndarray, strategy: str, num_segments: int = 4) -> jnp.ndarray:
    """Dispatcher (:256-267). 'local' is an alias of 'hybrid' (:251-254)."""
    if strategy == "global":
        return global_normalize(depth)
    if strategy in ("hybrid", "local"):
        return hybrid_normalize(depth, num_segments)
    if strategy == "none":
        return depth
    raise ValueError(f"unknown normalization strategy: {strategy}")
