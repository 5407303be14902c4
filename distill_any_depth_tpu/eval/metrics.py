"""Depth evaluation metrics.

Reproduces tools/evaluate.py:71-155 (the behavioral contract — the
reference file itself has broken imports, SURVEY.md §2.1): per-sample
mean-ratio scale alignment on valid (gt>0) pixels, then abs_rel, abs_diff,
sq_rel, rmse, rmse_log, delta<1.25^{1,2,3}. Implemented as a single jitted
batch computation with masked reductions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["compute_depth_metrics", "batched_depth_metrics", "METRIC_KEYS"]

METRIC_KEYS = ("abs_rel", "abs_diff", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def compute_depth_metrics(pred: np.ndarray, gt: np.ndarray, mask=None) -> dict:
    """Single-sample numpy metrics (evaluate.py:71-114), no alignment."""
    pred, gt = np.asarray(pred), np.asarray(gt)
    if mask is None:
        mask = gt > 0
    pred, gt = pred[mask], gt[mask]
    if pred.size == 0:
        return {k: float("nan") for k in METRIC_KEYS}
    thresh = np.maximum(gt / pred, pred / gt)
    return {
        "abs_rel": float(np.mean(np.abs(gt - pred) / gt)),
        "abs_diff": float(np.mean(np.abs(gt - pred))),
        "sq_rel": float(np.mean((gt - pred) ** 2 / gt)),
        "rmse": float(np.sqrt(np.mean((gt - pred) ** 2))),
        "rmse_log": float(np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2))),
        "a1": float(np.mean(thresh < 1.25)),
        "a2": float(np.mean(thresh < 1.25**2)),
        "a3": float(np.mean(thresh < 1.25**3)),
    }


@jax.jit
def _batched(pred: jnp.ndarray, gt: jnp.ndarray):
    """Vectorized per-sample metrics with mean-ratio alignment
    (evaluate.py:135-147). pred/gt: [B, H, W]; mask = gt > 0."""
    mask = gt > 0
    maskf = mask.astype(jnp.float32)
    cnt = jnp.sum(maskf, axis=(1, 2))
    safe_cnt = jnp.maximum(cnt, 1.0)

    def masked_mean(x):
        return jnp.sum(jnp.where(mask, x, 0.0), axis=(1, 2)) / safe_cnt

    # mean-ratio scale alignment: pred *= mean(gt[mask]) / mean(pred[mask])
    scale = masked_mean(gt) / jnp.maximum(masked_mean(pred), 1e-12)
    pred = pred * scale[:, None, None]

    safe_pred = jnp.maximum(pred, 1e-12)
    thresh = jnp.maximum(gt / safe_pred, pred / jnp.maximum(gt, 1e-12))
    diff = gt - pred
    metrics = {
        "abs_rel": masked_mean(jnp.abs(diff) / jnp.maximum(gt, 1e-12)),
        "abs_diff": masked_mean(jnp.abs(diff)),
        "sq_rel": masked_mean(diff * diff / jnp.maximum(gt, 1e-12)),
        "rmse": jnp.sqrt(masked_mean(diff * diff)),
        "rmse_log": jnp.sqrt(
            masked_mean((jnp.log(jnp.maximum(gt, 1e-12)) - jnp.log(safe_pred)) ** 2)
        ),
        "a1": masked_mean((thresh < 1.25).astype(jnp.float32)),
        "a2": masked_mean((thresh < 1.25**2).astype(jnp.float32)),
        "a3": masked_mean((thresh < 1.25**3).astype(jnp.float32)),
    }
    return metrics, cnt > 0


def batched_depth_metrics(pred, gt) -> tuple[dict, np.ndarray]:
    """Returns (dict of [B] arrays, valid-sample bool [B])."""
    metrics, valid = _batched(jnp.asarray(pred), jnp.asarray(gt))
    return {k: np.asarray(v) for k, v in metrics.items()}, np.asarray(valid)
