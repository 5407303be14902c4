"""Scale-shift-invariant (SSI) alignment and masked L1.

Batched re-expression of the reference's masked_shift_and_scale /
masked_l1_loss / SSILoss (tools/train_distillation.py:449-543,675-684 and
demo.py:5-36), with the nanmedian replaced by a sort-based masked median
(ops/stats) — no host fallback, no per-element Python loops.

Shapes: depth/mask are ``[..., H, W]`` where the leading axes are any batch
axes (the reference reduces over everything after the first two dims of
[B, C, H, W]; with C==1 that is exactly the spatial reduction done here).
"""
from __future__ import annotations

import jax.numpy as jnp

from distill_any_depth_tpu.ops.stats import masked_median

__all__ = ["masked_shift_and_scale", "masked_l1_loss", "ssi_mae_loss"]


def _align(depth: jnp.ndarray, mask: jnp.ndarray, count_plus1: jnp.ndarray):
    batch_shape = depth.shape[:-2]
    flat = depth.reshape(*batch_shape, -1)
    mflat = mask.reshape(*batch_shape, -1)
    t = masked_median(flat, mflat)[..., None, None]  # 0 where empty (:490)
    diff = jnp.where(mask, jnp.abs(depth - t), 0.0)
    s = jnp.sum(diff.reshape(*batch_shape, -1), axis=-1)[..., None, None] / count_plus1
    return (depth - t) / (s + 1e-6)


def masked_shift_and_scale(
    depth_pred: jnp.ndarray, depth_gt: jnp.ndarray, mask: jnp.ndarray
):
    """Align pred and gt each by (x - median) / (MAD + 1e-6).

    MAD uses the reference's ``count + 1`` denominator (:470) and the
    normalization is applied to *all* pixels, not just valid ones.
    """
    batch_shape = depth_pred.shape[:-2]
    count_plus1 = (
        jnp.sum(mask.reshape(*batch_shape, -1), axis=-1).astype(depth_pred.dtype) + 1.0
    )[..., None, None]
    pred_aligned = _align(depth_pred, mask, count_plus1)
    gt_aligned = _align(depth_gt, mask, count_plus1)
    return pred_aligned, gt_aligned


def masked_l1_loss(
    pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray, dense: bool = False
):
    """|pred - target| zeroed at invalid pixels; scalar mean unless dense
    (train_distillation.py:535-542 — note the +1e-6 count regularizer that
    demo.py:34 lacks)."""
    elem = jnp.where(mask, jnp.abs(pred - target), 0.0)
    if dense:
        return elem
    return jnp.sum(elem) / (jnp.sum(mask) + 1e-6)


def ssi_mae_loss(
    depth_pred: jnp.ndarray,
    depth_gt: jnp.ndarray,
    mask: jnp.ndarray,
    dense: bool = False,
):
    """SSILoss.forward (:681-684): align both maps then masked L1."""
    pred_a, gt_a = masked_shift_and_scale(depth_pred, depth_gt, mask)
    return masked_l1_loss(pred_a, gt_a, mask, dense)
