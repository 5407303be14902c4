"""Train state and optimizer factory.

Optimizer semantics match the reference (tools/train_distillation.py:
1310-1350): Adam with L2-style weight decay (torch ``Adam(weight_decay=...)``
adds ``wd * param`` to the gradient *before* the Adam update — i.e.
``optax.add_decayed_weights`` placed before ``scale_by_adam``), global-norm
gradient clipping (:1570-1571), linear warmup then cosine-to-1% or step decay.

Unlike the reference, the full train state (params + optimizer moments +
step) is checkpointable, fixing its cannot-resume gap (SURVEY.md §5).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from distill_any_depth_tpu.configs import OptimizerConfig

__all__ = ["TrainState", "make_optimizer", "make_lr_schedule", "create_train_state"]


class TrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    params: Any
    opt_state: Any


def make_lr_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = max(int(cfg.warmup_steps), 0)
    schedules, boundaries = [], []
    if warmup > 0:
        schedules.append(optax.linear_schedule(0.0, cfg.lr, warmup))
        boundaries.append(warmup)
    decay_steps = max(cfg.total_steps - warmup, 1)
    if cfg.schedule == "cosine":
        schedules.append(
            optax.cosine_decay_schedule(cfg.lr, decay_steps, alpha=cfg.eta_min_ratio)
        )
    elif cfg.schedule == "step":
        schedules.append(
            optax.exponential_decay(
                cfg.lr, cfg.step_size, cfg.gamma, staircase=True
            )
        )
    elif cfg.schedule == "none":
        schedules.append(optax.constant_schedule(cfg.lr))
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    if warmup > 0:
        return optax.join_schedules(schedules, boundaries)
    return schedules[0]


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    chain = []
    if cfg.max_grad_norm and cfg.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    if cfg.weight_decay:
        # torch-Adam L2: decay enters the gradient before the moments.
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    if cfg.skip_nonfinite_updates:
        # NaN/inf gradients skip the update instead of poisoning the moments
        # (failure containment the reference lacks — its only guards are
        # inside the SSI loss, train_distillation.py:490,518).
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    return tx


def create_train_state(params: Any, cfg: OptimizerConfig) -> tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state), tx
