"""Loss-weight grid search.

The working equivalent of scripts/tune_loss_weights.py (whose emitted flags
didn't match the train parser — SURVEY.md §2.1): enumerate lambda
combinations, run short in-process training runs (no subprocess churn — the
jitted step recompiles only when shapes change, and loss weights are
config constants baked per run), rank by validation loss, dump a ranked
JSON report.
"""
from __future__ import annotations

import dataclasses
import itertools
import json
import logging
import os
from typing import Sequence

import numpy as np

from distill_any_depth_tpu.configs import LossConfig, TrainConfig

logger = logging.getLogger("distill_any_depth_tpu.tuner")

__all__ = ["generate_experiment_configs", "tune_loss_weights"]

DEFAULT_GRID = {
    "lambda_sc": (0.25, 0.5, 1.0),
    "lambda_lg": (0.25, 0.5),
    "lambda_feat": (0.5, 1.0),
    "lambda_grad": (0.1, 0.2),
    "lambda_hdn": (0.4, 0.8),
}


def generate_experiment_configs(
    base: TrainConfig, grid: dict[str, Sequence[float]] | None = None,
    max_experiments: int | None = None,
) -> list[TrainConfig]:
    grid = grid or DEFAULT_GRID
    keys = sorted(grid)
    configs = []
    for combo in itertools.product(*(grid[k] for k in keys)):
        overrides = dict(zip(keys, combo))
        loss = dataclasses.replace(base.loss, **overrides)
        configs.append(dataclasses.replace(base, loss=loss))
        if max_experiments and len(configs) >= max_experiments:
            break
    return configs


def tune_loss_weights(
    base: TrainConfig,
    run_fn,
    grid: dict[str, Sequence[float]] | None = None,
    max_experiments: int | None = None,
    output_dir: str | None = None,
) -> list[dict]:
    """Run the grid; ``run_fn(cfg) -> history dict`` (e.g. train_nyu).
    Returns experiments ranked by final validation loss (train loss as
    fallback), best first."""
    results = []
    for i, cfg in enumerate(generate_experiment_configs(base, grid, max_experiments)):
        exp_dir = os.path.join(output_dir or base.output_dir, f"exp_{i:03d}")
        cfg = dataclasses.replace(cfg, output_dir=exp_dir)
        lambdas = {
            k: getattr(cfg.loss, k)
            for k in ("lambda_sc", "lambda_lg", "lambda_feat", "lambda_grad",
                      "lambda_hdn")
        }
        logger.info("experiment %d: %s", i, lambdas)
        try:
            history = run_fn(cfg)
            score = (history.get("val_loss") or history.get("train_loss") or [float("inf")])[-1]
            if not np.isfinite(score):
                score = float("inf")  # a diverged run must never rank first
            results.append({"experiment": i, "lambdas": lambdas, "score": score,
                            "history": history})
        except Exception as e:  # a failed config should not kill the sweep
            logger.exception("experiment %d failed", i)
            results.append({"experiment": i, "lambdas": lambdas,
                            "score": float("inf"), "error": str(e)})

    results.sort(key=lambda r: r["score"])
    report_path = os.path.join(output_dir or base.output_dir, "tuning_results.json")
    os.makedirs(os.path.dirname(report_path), exist_ok=True)
    with open(report_path, "w") as f:
        json.dump(results, f, indent=2)
    logger.info("best: %s", results[0] if results else None)
    return results
