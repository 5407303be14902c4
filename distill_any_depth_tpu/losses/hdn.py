"""Hierarchical Depth Normalization (HDN) loss — dr / dp / ds contexts.

Re-expression of tools/train_distillation.py:544-707 (and the canonical
demo.py:44-161) without per-image Python loops: contexts are a static
``[K, B, H, W]`` bool tensor built with broadcasting (K = sum over levels of
bins-per-level; level 3 => 7 contexts for dr/dp, 21 for ds) and the dense SSI
is computed once over the folded (K*B) axis.

Normalizer variants (both exist in the reference):

- ``"covered"``: divide by the number of pixels covered by >=1 context
  (train_distillation.py:705) — the variant the training loop uses.
- ``"valid"``: divide by ``mask.sum()`` (demo.py:158) — the demo variant.
"""
from __future__ import annotations

import jax.numpy as jnp

from distill_any_depth_tpu.losses.ssi import ssi_mae_loss
from distill_any_depth_tpu.ops.stats import masked_quantile

__all__ = ["get_contexts_dr", "get_contexts_dp", "get_contexts_ds", "hdn_loss"]


def _bin_fractions(level: int) -> list[tuple[float, float]]:
    """Static (lo, hi) fractional bin edges, finest-to-coarsest order
    matching the reference's reversed bin_size_list (:562-568)."""
    edges = []
    for bin_size in [(1 / 2) ** i for i in reversed(range(level))]:
        for i in range(int(1 / bin_size)):
            edges.append((i * bin_size, (i + 1) * bin_size))
    return edges


def get_contexts_dr(
    level: int, depth_gt: jnp.ndarray, mask: jnp.ndarray | None
) -> jnp.ndarray:
    """Depth-range contexts (:544-576). depth_gt/mask: [B, H, W] ->
    bool [K, B, H, W]."""
    if mask is None:
        mask = jnp.ones_like(depth_gt, dtype=bool)
    b = depth_gt.shape[0]
    flat = depth_gt.reshape(b, -1)
    mflat = mask.reshape(b, -1)
    # min/max over valid pixels; empty -> +inf/-inf makes every bin empty,
    # matching the reference's "no valid pixel -> all-false contexts" branch
    # (:556-557, valid_map is all false there).
    dmin = jnp.min(jnp.where(mflat, flat, jnp.inf), axis=-1)[:, None, None]
    dmax = jnp.max(jnp.where(mflat, flat, -jnp.inf), axis=-1)[:, None, None]
    rng = dmax - dmin
    ctxs = []
    for lo_f, hi_f in _bin_fractions(level):
        lo = dmin + rng * lo_f
        hi = dmin + rng * hi_f + 1e-30
        ctxs.append((depth_gt >= lo) & (depth_gt < hi) & mask)
    return jnp.stack(ctxs, axis=0)


def get_contexts_dp(
    level: int, depth_gt: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Depth-percentile contexts via masked nanquantile (:578-644)."""
    b = depth_gt.shape[0]
    flat = depth_gt.reshape(b, -1)
    mflat = mask.reshape(b, -1)
    ctxs = []
    for lo_f, hi_f in _bin_fractions(level):
        lo = masked_quantile(flat, mflat, lo_f)[:, None, None]
        hi = masked_quantile(flat, mflat, hi_f)[:, None, None]
        # NaN quantiles (empty mask) compare false, matching torch.
        ctxs.append(mask & (depth_gt >= lo) & (depth_gt < hi))
    return jnp.stack(ctxs, axis=0)


def get_contexts_ds(level: int, mask: jnp.ndarray) -> jnp.ndarray:
    """Spatial-grid contexts (:646-673): per level a (1/bs)^2 cell grid,
    built from the trailing spatial size (square images, like the
    reference's mask_valid.shape[-1])."""
    h, w = mask.shape[-2], mask.shape[-1]
    size = w
    ctxs = []
    for bin_size in [(1 / 2) ** i for i in reversed(range(level))]:
        n = int(1 / bin_size)
        for gy in range(n):
            for gx in range(n):
                cell = jnp.zeros((h, w), dtype=bool)
                y0, y1 = int(gy * bin_size * size), int((gy + 1) * bin_size * size)
                x0, x1 = int(gx * bin_size * size), int((gx + 1) * bin_size * size)
                cell = cell.at[y0:y1, x0:x1].set(True)
                ctxs.append(mask & cell)
    return jnp.stack(ctxs, axis=0)


def hdn_loss(
    depth_pred: jnp.ndarray,
    depth_gt: jnp.ndarray,
    contexts: jnp.ndarray,
    normalizer: str = "covered",
    valid_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """compute_hdn_loss (:686-707 / demo.py:142-161).

    depth_pred/depth_gt: [B, H, W]; contexts: bool [K, B, H, W].
    """
    k, b = contexts.shape[0], contexts.shape[1]
    pred_rep = jnp.broadcast_to(depth_pred[None], contexts.shape)
    gt_rep = jnp.broadcast_to(depth_gt[None], contexts.shape)
    # Fold the context axis into the batch: one dense SSI pass.
    dense = ssi_mae_loss(
        pred_rep.reshape(k * b, *depth_pred.shape[1:]),
        gt_rep.reshape(k * b, *depth_gt.shape[1:]),
        contexts.reshape(k * b, *depth_gt.shape[1:]),
        dense=True,
    ).reshape(contexts.shape)

    per_pixel_sum = jnp.sum(dense, axis=0)
    times = jnp.sum(contexts, axis=0)
    covered = times > 0
    per_pixel = jnp.where(covered, per_pixel_sum / jnp.maximum(times, 1), per_pixel_sum)

    if normalizer == "covered":
        denom = jnp.sum(covered) + 1e-6
    elif normalizer == "valid":
        if valid_mask is None:
            raise ValueError("normalizer='valid' needs valid_mask")
        denom = jnp.sum(valid_mask)
    else:
        raise ValueError(f"unknown normalizer {normalizer!r}")
    return jnp.sum(per_pixel) / denom
