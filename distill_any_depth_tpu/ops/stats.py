"""Masked order statistics with static shapes.

The TPU answer to the reference's ``nanmedian``/``nanquantile`` (and their
per-element CPU fallback loops, tools/train_distillation.py:449-533,578-644):
push invalid entries to +inf, sort once, and gather at mask-count-derived
indices. Fully vectorized over leading batch axes, O(N log N), jit-safe.

Gradient routing: the sort runs under ``stop_gradient`` and only yields the
*positions* of the order statistics; the returned values are tiny gathers
from the ORIGINAL array. The backward pass is therefore a one-element
scatter per row instead of a full scatter of the cotangent through the
sort permutation — at the distillation loss's [7*16, 153k] shapes the sort
backward dominated the whole train step before this.

Semantics match torch exactly:

- ``masked_median``: *lower* median — index ``(count-1)//2`` of the sorted
  valid values (torch.median / nanmedian convention); 0.0 when no valid
  entries (the reference nan->0 fixup, train_distillation.py:490,518).
- ``masked_quantile``: linear interpolation at ``q*(count-1)`` (torch
  nanquantile); NaN when no valid entries.
- ``median_all``: torch.median over all entries (lower median, no mask).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["masked_median", "masked_quantile", "median_all", "masked_mean"]

_INF = jnp.inf


def _argsort_masked(x: jnp.ndarray, mask: jnp.ndarray | None):
    """Permutation that sorts the last axis with invalid entries pushed to
    +inf (no gradient flows through the sort), and per-row valid counts."""
    filled = x if mask is None else jnp.where(mask, x, _INF)
    n = x.shape[-1]
    iota = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32), x.shape
    )
    _, perm = jax.lax.sort(
        (jax.lax.stop_gradient(filled), iota), num_keys=1, is_stable=True,
        dimension=-1,
    )
    count = None if mask is None else jnp.sum(mask, axis=-1)
    return perm, count


def _gather_stat(x: jnp.ndarray, perm: jnp.ndarray, idx: jnp.ndarray):
    """x[perm[idx]] along the last axis — the differentiable read."""
    orig = jnp.take_along_axis(perm, idx[..., None], axis=-1)
    return jnp.take_along_axis(x, orig, axis=-1)[..., 0]


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Lower median of ``x[mask]`` along the last axis; 0 where count==0."""
    perm, count = _argsort_masked(x, mask)
    idx = jnp.maximum(count - 1, 0) // 2
    med = _gather_stat(x, perm, idx)
    return jnp.where(count > 0, med, 0.0)


def median_all(x: jnp.ndarray) -> jnp.ndarray:
    """torch.median along the last axis (lower middle element)."""
    perm, _ = _argsort_masked(x, None)
    idx = jnp.full(x.shape[:-1], (x.shape[-1] - 1) // 2, dtype=jnp.int32)
    return _gather_stat(x, perm, idx)


def masked_quantile(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """torch.nanquantile along the last axis (linear interpolation);
    NaN where no valid entries."""
    perm, count = _argsort_masked(x, mask)
    pos = q * (count.astype(jnp.float32) - 1.0)
    pos = jnp.maximum(pos, 0.0)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[-1] - 1)
    hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, x.shape[-1] - 1)
    v_lo = _gather_stat(x, perm, lo)
    v_hi = _gather_stat(x, perm, hi)
    frac = pos - jnp.floor(pos)
    val = v_lo + frac * (v_hi - v_lo)
    return jnp.where(count > 0, val, jnp.nan)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Mean of ``x[mask]`` along the last axis with an optional +eps count
    regularizer (the reference uses count+1 or count+1e-6 in places)."""
    s = jnp.sum(jnp.where(mask, x, 0.0), axis=-1)
    c = jnp.sum(mask, axis=-1).astype(x.dtype) + eps
    return s / c
