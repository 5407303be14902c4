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

__all__ = ["TrainState", "GuardedClipState", "make_optimizer",
           "make_lr_schedule", "create_train_state"]


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


class GuardedClipState(NamedTuple):
    inner_state: Any
    notfinite_count: jnp.ndarray  # scalar int32
    last_norm: jnp.ndarray  # scalar fp32: the UNclipped global grad norm


def _clip_and_guard(
    max_norm: float, inner: optax.GradientTransformation, guard: bool
) -> optax.GradientTransformation:
    """Global-norm clipping and nonfinite-update skipping from ONE norm.

    ``optax.clip_by_global_norm`` + ``optax.apply_if_finite`` each traverse
    every gradient leaf with their own reduction (clip: sum of squares;
    apply_if_finite: per-leaf isfinite trees) — at ViT-B scale those
    hundreds of small fused reduces were ~10-15 ms of the bs16 train step.
    One global norm is sufficient for both: any NaN/Inf in any leaf makes
    the sum of squares nonfinite, so ``isfinite(norm)`` == all-finite, and
    the clip scale derives from the same scalar. The norm is kept in the
    state so the step's metrics read it without recomputing."""

    def init(params):
        return GuardedClipState(
            inner.init(params), jnp.zeros((), jnp.int32), jnp.zeros(())
        )

    def update(updates, state, params=None):
        norm = optax.global_norm(updates)
        scale = (
            max_norm / jnp.maximum(norm, max_norm)
            if max_norm and max_norm > 0
            else jnp.float32(1.0)
        )

        def run(operand):
            ups, prms = operand
            scaled = jax.tree_util.tree_map(
                lambda g: g * scale.astype(g.dtype), ups
            )
            return inner.update(scaled, state.inner_state, prms)

        if guard:
            finite = jnp.isfinite(norm)
            new_updates, new_inner = jax.lax.cond(
                finite,
                run,
                lambda op: (
                    jax.tree_util.tree_map(jnp.zeros_like, op[0]),
                    state.inner_state,
                ),
                (updates, params),
            )
            count = jnp.where(
                finite, jnp.int32(0), state.notfinite_count + jnp.int32(1)
            )
        else:
            new_updates, new_inner = run((updates, params))
            count = state.notfinite_count
        return new_updates, GuardedClipState(new_inner, count, norm)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    chain = []
    if cfg.weight_decay:
        # torch-Adam L2: decay enters the gradient before the moments.
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    chain.append(optax.scale_by_learning_rate(schedule))
    # clip + NaN/inf-skip derived from one global norm (failure containment
    # the reference lacks — its only guards are inside the SSI loss,
    # train_distillation.py:490,518)
    return _clip_and_guard(
        cfg.max_grad_norm, optax.chain(*chain), cfg.skip_nonfinite_updates
    )


def create_train_state(params: Any, cfg: OptimizerConfig) -> tuple[TrainState, optax.GradientTransformation]:
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state), tx
