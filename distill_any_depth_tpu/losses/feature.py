"""Feature distillation loss (cosine over the token axis).

Behavioral re-expression of tools/train_distillation.py:284-428 for the
shapes the pipeline actually produces: student/teacher features are
``[B, N, C]`` final-tap tokens (dpt.py:225 / dam.py:419). The reference's
"spatial" resize on a 3-D tensor therefore acts on the *channel* axis with
1-D nearest interpolation (:326-340), and the cosine similarity runs over
the *token* axis (dim=1, :389-393). Both quirks are reproduced exactly.

Documented divergence: when token counts differ, the reference draws **fresh
random projection matrices every step** that never join the optimizer
(:365-377 — a new random projection per call). Here the projection is a
fixed-seed constant (same distribution, deterministic), which is the
behaviorally sane version of the same idea. SURVEY.md §7 flags this.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from distill_any_depth_tpu.ops.resize import resize_1d

__all__ = ["feature_distillation_loss"]

_PROJ_SEED = 8421


def _cosine_over_tokens(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """1 - mean cosine similarity along axis 1 (the token axis).

    Matches F.normalize(dim=1) + F.cosine_similarity(dim=1): normalizing
    twice is idempotent up to the eps guards.
    """
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    cos = jnp.sum(an * bn, axis=1)
    return 1.0 - jnp.mean(cos)


def feature_distillation_loss(
    student_feat: jnp.ndarray, teacher_feat: jnp.ndarray
) -> jnp.ndarray:
    """Cosine feature-alignment loss for ``[B, N, C]`` token features."""
    sf, tf = student_feat, teacher_feat
    assert sf.ndim == 3 and tf.ndim == 3, (sf.shape, tf.shape)

    # "Spatial" (= channel, for 3-D tensors) reconciliation: nearest-resize
    # the larger channel dim down to the smaller (:321-340).
    if sf.shape[2] != tf.shape[2]:
        target = min(sf.shape[2], tf.shape[2])
        if sf.shape[2] != target:
            sf = resize_1d(sf, target, "nearest", axis=2)
        if tf.shape[2] != target:
            tf = resize_1d(tf, target, "nearest", axis=2)

    # Token-count reconciliation (:343-377): fixed-key random projection to
    # the smaller token count (reference uses a fresh random matrix per call).
    if sf.shape[1] != tf.shape[1]:
        target = min(sf.shape[1], tf.shape[1])

        def project(x: jnp.ndarray, key_salt: int) -> jnp.ndarray:
            if x.shape[1] == target:
                return x
            k = jax.random.PRNGKey(_PROJ_SEED + key_salt)
            proj = jax.random.normal(k, (x.shape[1], target), x.dtype)
            proj = proj / (x.shape[1] ** 0.5)
            return jnp.einsum("bcs,ct->bts", x, proj)

        sf = project(sf, 0)
        tf = project(tf, 1)

    return _cosine_over_tokens(sf, tf)
