"""Local-window attention bias for high-resolution token grids.

The reference bounds attention cost at high resolution with a windowed ViT
variant whose xformers ``local_2d_pattern`` additive log-mask has corner/edge
completion (ViT_DINO.py:1141-1178, applied :1217-1234). Here the same
capability is a precomputed additive bias fed to the attention op (einsum or
Pallas flash): 0 inside the local 2-D window, -inf outside; prefix tokens
(cls/registers) attend and are attended everywhere.

The bias is built with numpy at trace time (static grid under jit) and
constant-folded by XLA.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["local_window_bias", "segment_bias"]


@functools.lru_cache(maxsize=64)
def _bias_np(gh: int, gw: int, window: int, n_prefix: int) -> np.ndarray:
    n = n_prefix + gh * gw
    ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    ys, xs = ys.reshape(-1), xs.reshape(-1)
    half = window // 2
    # Corner/edge completion (the reference's window-mask fixup,
    # ViT_DINO.py:1162-1171): the window CENTER is clamped inward so border
    # tokens attend to a full window x window block instead of a truncated
    # one. When the grid is smaller than the window, the clamp degenerates
    # to a fixed center whose window covers the whole axis.
    cy = np.clip(ys, half, max(gh - 1 - half, half))
    cx = np.clip(xs, half, max(gw - 1 - half, half))
    dy = np.abs(cy[:, None] - ys[None, :])
    dx = np.abs(cx[:, None] - xs[None, :])
    allowed = (dy <= half) & (dx <= half)
    bias = np.full((n, n), -np.inf, dtype=np.float32)
    bias[:n_prefix, :] = 0.0
    bias[:, :n_prefix] = 0.0
    bias[n_prefix:, n_prefix:][allowed] = 0.0
    return bias


def local_window_bias(
    gh: int, gw: int, window: int, n_prefix: int = 1
) -> jnp.ndarray:
    """Additive ``[N, N]`` attention bias (N = n_prefix + gh*gw) restricting
    patch-token attention to a ``window x window`` neighbourhood."""
    return jnp.asarray(_bias_np(gh, gw, window, n_prefix))


def segment_bias(segment_ids: jnp.ndarray) -> jnp.ndarray:
    """Block-diagonal additive bias from per-token segment ids.

    The TPU equivalent of xformers ``BlockDiagonalMask`` nested-tensor
    batching (reference block.py:154-243): multiple variable-length
    sequences packed along one token axis attend only within their own
    segment. ``segment_ids``: int ``[N]`` -> bias ``[N, N]`` (0 within a
    segment, -inf across).
    """
    same = segment_ids[:, None] == segment_ids[None, :]
    return jnp.where(same, 0.0, -jnp.inf).astype(jnp.float32)
