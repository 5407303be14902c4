"""NYU evaluation harness.

The working version of tools/evaluate.py:116-241 (whose own imports are
broken in the reference — SURVEY.md §2.1): batched model inference + the
mean-ratio-aligned 8-metric set, optional side-by-side comparison of two
checkpoints, report writing.
"""
from __future__ import annotations

import json
import logging
import os
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from distill_any_depth_tpu.eval.metrics import METRIC_KEYS, batched_depth_metrics

logger = logging.getLogger("distill_any_depth_tpu.eval")

__all__ = ["evaluate_model", "compare_models", "write_report"]


def evaluate_model(model, params, batches: Iterable[dict]) -> dict:
    """Average the 8 metrics over all valid samples.

    ``batches`` yield {'image': [B,H,W,3], 'depth': [B,H,W]}. When the
    prediction and GT resolutions differ (the registry datasets' native-
    resolution protocol, data/registry.py), the PREDICTION is bilinearly
    upsampled to the GT grid and the GT stays untouched — the
    geobench/Marigold convention behind the reference's eval YAMLs
    (torch F.interpolate default, align_corners=False).
    """
    from distill_any_depth_tpu.ops.resize import resize_2d

    def _fwd(p, x, gt_hw: tuple):
        pred = model.apply({"params": p}, x)[0]
        if pred.shape[1:3] != gt_hw:
            pred = resize_2d(
                pred[..., None].astype(jnp.float32), gt_hw, "bilinear",
                align_corners=False,
            )[..., 0]
        return pred.astype(jnp.float32)

    fwd = jax.jit(_fwd, static_argnums=(2,))
    sums = {k: 0.0 for k in METRIC_KEYS}
    n = 0
    for batch in batches:
        gt_hw = tuple(np.asarray(batch["depth"]).shape[1:3])
        pred = fwd(params, jnp.asarray(batch["image"], model.dtype), gt_hw)
        per_sample, valid = batched_depth_metrics(
            np.asarray(pred, np.float32), np.asarray(batch["depth"], np.float32)
        )
        for k in METRIC_KEYS:
            vals = per_sample[k][valid]
            sums[k] += float(np.nansum(vals))
        n += int(valid.sum())
    if n == 0:
        return {k: float("nan") for k in METRIC_KEYS}
    return {k: sums[k] / n for k in METRIC_KEYS}


def compare_models(model_a, params_a, model_b, params_b, make_batches) -> dict:
    """Evaluate two models on the same data (reference compares distilled vs
    original, evaluate.py:157-241)."""
    return {
        "model_a": evaluate_model(model_a, params_a, make_batches()),
        "model_b": evaluate_model(model_b, params_b, make_batches()),
    }


def write_report(path: str, results: dict, title: str = "NYU evaluation") -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    lines = [title, "=" * len(title), ""]
    for name, metrics in results.items():
        lines.append(f"[{name}]")
        for k in METRIC_KEYS:
            if k in metrics:
                lines.append(f"  {k:10s} {metrics[k]:.6f}")
        lines.append("")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    with open(os.path.splitext(path)[0] + ".json", "w") as f:
        json.dump(results, f, indent=2)
    logger.info("wrote %s", path)
