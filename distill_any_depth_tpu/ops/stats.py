"""Masked order statistics with static shapes.

The TPU answer to the reference's ``nanmedian``/``nanquantile`` (and their
per-element CPU fallback loops, tools/train_distillation.py:449-533,578-644):
push invalid entries to +inf, sort once, and gather at mask-count-derived
indices. Fully vectorized over leading batch axes, O(N log N), jit-safe.

Semantics match torch exactly:

- ``masked_median``: *lower* median — index ``(count-1)//2`` of the sorted
  valid values (torch.median / nanmedian convention); 0.0 when no valid
  entries (the reference nan->0 fixup, train_distillation.py:490,518).
- ``masked_quantile``: linear interpolation at ``q*(count-1)`` (torch
  nanquantile); NaN when no valid entries.
- ``median_all``: torch.median over all entries (lower median, no mask).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["masked_median", "masked_quantile", "median_all", "masked_mean"]

_INF = jnp.inf


def _sort_masked(x: jnp.ndarray, mask: jnp.ndarray):
    """Sort last axis with invalid entries pushed to +inf; return sorted
    values and per-row valid counts."""
    filled = jnp.where(mask, x, _INF)
    srt = jnp.sort(filled, axis=-1)
    count = jnp.sum(mask, axis=-1)
    return srt, count


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Lower median of ``x[mask]`` along the last axis; 0 where count==0."""
    srt, count = _sort_masked(x, mask)
    idx = jnp.maximum(count - 1, 0) // 2
    med = jnp.take_along_axis(srt, idx[..., None], axis=-1)[..., 0]
    return jnp.where(count > 0, med, 0.0)


def median_all(x: jnp.ndarray) -> jnp.ndarray:
    """torch.median along the last axis (lower middle element)."""
    srt = jnp.sort(x, axis=-1)
    idx = (x.shape[-1] - 1) // 2
    return srt[..., idx]


def masked_quantile(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """torch.nanquantile along the last axis (linear interpolation);
    NaN where no valid entries."""
    srt, count = _sort_masked(x, mask)
    pos = q * (count.astype(jnp.float32) - 1.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[-1] - 1)
    hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, x.shape[-1] - 1)
    v_lo = jnp.take_along_axis(srt, lo[..., None], axis=-1)[..., 0]
    v_hi = jnp.take_along_axis(srt, hi[..., None], axis=-1)[..., 0]
    frac = pos - jnp.floor(pos)
    val = v_lo + frac * (v_hi - v_lo)
    return jnp.where(count > 0, val, jnp.nan)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Mean of ``x[mask]`` along the last axis with an optional +eps count
    regularizer (the reference uses count+1 or count+1e-6 in places)."""
    s = jnp.sum(jnp.where(mask, x, 0.0), axis=-1)
    c = jnp.sum(mask, axis=-1).astype(x.dtype) + eps
    return s / c
