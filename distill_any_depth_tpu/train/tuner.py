"""Loss-weight grid search.

The working equivalent of scripts/tune_loss_weights.py (whose emitted flags
didn't match the train parser — SURVEY.md §2.1). Two modes:

- ``tune_loss_weights``: generic — runs ``run_fn(cfg)`` (e.g. train_nyu) per
  lambda combination and ranks by validation loss.
- ``tune_loss_weights_traced``: fast in-process sweep — builds the models and
  jitted step ONCE with the lambdas as TRACED scalar arguments
  (train/step.py ``loss_weights``), so a 48-point grid pays a single
  compile instead of 48 full student+teacher compiles.
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

__all__ = [
    "generate_experiment_configs",
    "tune_loss_weights",
    "tune_loss_weights_traced",
]

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


def tune_loss_weights_traced(
    base: TrainConfig,
    train_batches,
    val_batches,
    grid: dict[str, Sequence[float]] | None = None,
    steps_per_experiment: int = 20,
    max_experiments: int | None = None,
    output_dir: str | None = None,
) -> list[dict]:
    """One-compile lambda sweep.

    ``train_batches``/``val_batches``: sequences (reused per experiment) of
    dict batches with 'global_image'/'local_image' (or 'image') arrays.
    Builds student/teachers/optimizer from ``base`` once; each experiment
    re-initializes the train state and runs ``steps_per_experiment`` steps
    with its lambda combination passed as traced scalars. Ranked results +
    JSON report as in ``tune_loss_weights``.
    """
    import jax
    import jax.numpy as jnp

    from distill_any_depth_tpu.configs import model_config
    from distill_any_depth_tpu.models.factory import create_model, init_params
    from distill_any_depth_tpu.train.state import create_train_state
    from distill_any_depth_tpu.train.step import make_eval_loss_fn, make_train_step
    from distill_any_depth_tpu.utils import checkpoint as ckpt_io

    grid = grid or DEFAULT_GRID
    student_dtype = jnp.dtype(base.student_compute_dtype)
    teacher_dtype = jnp.dtype(base.teacher_dtype)
    student = create_model(base.student, dtype=student_dtype,
                           attn_impl=base.attn_impl)
    sp0 = init_params(student, base.seed, image_size=base.image_size)

    teachers, teacher_params = [], []
    for i, name in enumerate(base.teachers):
        tcfg = model_config(name)
        model = create_model(tcfg, dtype=teacher_dtype, attn_impl=base.attn_impl)
        if i < len(base.teacher_checkpoints) and base.teacher_checkpoints[i]:
            params = ckpt_io.load_safetensors(base.teacher_checkpoints[i], tcfg)
        else:
            params = init_params(model, base.seed + 1 + i,
                                 image_size=base.image_size)
        teachers.append(model)
        teacher_params.append(jax.tree_util.tree_map(jnp.asarray, params))
    teacher_params = tuple(teacher_params)

    s_apply = lambda p, x: student.apply(  # noqa: E731
        {"params": p}, x.astype(student_dtype))
    t_applies = [
        (lambda p, x, m=m: m.apply({"params": p}, x.astype(teacher_dtype)))
        for m in teachers
    ]
    _, tx = create_train_state(sp0, base.optimizer)
    step = make_train_step(s_apply, t_applies, tx, base.loss, seed=base.seed)
    eval_fn = make_eval_loss_fn(s_apply, t_applies, base.loss, seed=base.seed)

    def views(batch):
        g = batch.get("global_image", batch.get("image"))
        l = batch.get("local_image", g)
        return jnp.asarray(g, jnp.float32), jnp.asarray(l, jnp.float32)

    results = []
    keys = sorted(grid)
    combos = list(itertools.product(*(grid[k] for k in keys)))
    if max_experiments:
        combos = combos[:max_experiments]
    for i, combo in enumerate(combos):
        lambdas = dict(zip(keys, combo))
        weights = {k[len("lambda_"):]: jnp.float32(v) for k, v in lambdas.items()}
        state, _ = create_train_state(
            jax.tree_util.tree_map(jnp.array, sp0), base.optimizer
        )
        train_hist = []
        for b in itertools.islice(itertools.cycle(train_batches),
                                  steps_per_experiment):
            g, l = views(b)
            state, metrics = step(state, teacher_params, g, l,
                                  loss_weights=weights)
            train_hist.append(float(metrics["total"]))
        val_hist = []
        for j, b in enumerate(val_batches or ()):
            g, l = views(b)
            comps = eval_fn(state.params, teacher_params, jnp.int32(j), g, l,
                            loss_weights=weights)
            val_hist.append(float(comps["total"]))
        score = float(np.mean(val_hist)) if val_hist else train_hist[-1]
        if not np.isfinite(score):
            score = float("inf")
        logger.info("experiment %d %s -> %.4f", i, lambdas, score)
        results.append({
            "experiment": i, "lambdas": lambdas, "score": score,
            "history": {"train_loss": train_hist, "val_loss": val_hist},
        })

    results.sort(key=lambda r: r["score"])
    report_dir = output_dir or base.output_dir
    os.makedirs(report_dir, exist_ok=True)
    with open(os.path.join(report_dir, "tuning_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    logger.info("best: %s", results[0] if results else None)
    return results
