"""Masked order statistics with static shapes.

The TPU answer to the reference's ``nanmedian``/``nanquantile`` (and their
per-element CPU fallback loops, tools/train_distillation.py:449-533,578-644).

Selection is a 32-step binary search over the IEEE-754 bit order — NOT a
sort. ``jax.lax.sort`` at the distillation loss's [7*16, 153k] shapes was
91% of the whole loss stack fwd+bwd (57 of 62 ms, xprof-traced): XLA's TPU
sort is O(N log^2 N) with a large constant. Mapping fp32 bits to an
order-isomorphic uint32 (negative -> ~bits, else bits | sign) makes the
k-th valid element findable with 32 masked count-compare passes — pure
VPU reduces, ~bandwidth-bound — and one argmax pass recovers its position.
The returned value is a tiny differentiable gather from the ORIGINAL
array at that position, so the backward is a one-element scatter per row
(exactly the contract the old stop-gradient sort provided). Identical
element, identical value, ~10x less time.

Semantics match torch exactly (the selected element IS the element a
stable sort would pick; on exact-value ties the gradient lands on the
first occurrence, as before).

Semantics match torch exactly:

- ``masked_median``: *lower* median — index ``(count-1)//2`` of the sorted
  valid values (torch.median / nanmedian convention); 0.0 when no valid
  entries (the reference nan->0 fixup, train_distillation.py:490,518).
- ``masked_quantile``: linear interpolation at ``q*(count-1)`` (torch
  nanquantile); NaN when no valid entries.
- ``median_all``: torch.median over all entries (lower median, no mask).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["masked_median", "masked_quantile", "median_all", "masked_mean"]

_INF = jnp.inf
# Rows at/above this length use the Pallas fused-bisection kernel: all 32
# steps run on a VMEM-resident row, one HBM pass instead of 33 (each jnp
# bisection step re-reads the full array from HBM; at the HDN loss's
# [112, 153k] shapes those reads were ~25 ms of the train step).
_PALLAS_MIN_COLS = 32 * 1024


def _order_bits(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """fp32 -> order-isomorphic uint32 (x < y  <=>  bits(x) < bits(y));
    invalid entries mapped to the maximum so they sort last."""
    b = jax.lax.bitcast_convert_type(
        jax.lax.stop_gradient(x.astype(jnp.float32)), jnp.uint32
    )
    sign = jnp.uint32(0x80000000)
    u = jnp.where((b & sign) != 0, ~b, b | sign)
    if mask is not None:
        u = jnp.where(mask, u, jnp.uint32(0xFFFFFFFF))
    return u


def _kth_valid_index(
    u: jnp.ndarray, mask: jnp.ndarray | None, k: jnp.ndarray
) -> jnp.ndarray:
    """Index (first occurrence) of the k-th smallest valid element of the
    order-bit array ``u`` along the last axis; 32-step bisection over the
    uint32 value range, O(32 N) masked count-compares, no sort.

    Long rows dispatch to the Pallas fused kernel (one HBM pass); the mask
    is already folded into ``u`` by _order_bits, so the kernel needs no
    mask operand (divergence only for a VALID element whose order bits are
    exactly 0xFFFFFFFF — a full-payload NaN, which masks exclude)."""
    if u.shape[-1] >= _PALLAS_MIN_COLS:
        lead = u.shape[:-1]
        idx = _kth_valid_index_fused(
            u.reshape(-1, u.shape[-1]),
            jnp.broadcast_to(k, lead).reshape(-1),
        )
        return idx.reshape(lead)
    k1 = (k + 1).astype(jnp.int32)[..., None]

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        le = u <= mid[..., None]
        if mask is not None:
            le = le & mask
        cnt = jnp.sum(le, axis=-1, keepdims=True, dtype=jnp.int32)
        take = cnt >= k1
        return (
            jnp.where(take[..., 0], lo, mid + 1),
            jnp.where(take[..., 0], mid, hi),
        )

    lo = jnp.zeros(u.shape[:-1], jnp.uint32)
    hi = jnp.full(u.shape[:-1], 0xFFFFFFFF, jnp.uint32)
    lo, _ = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return jnp.argmax(u == lo[..., None], axis=-1).astype(jnp.int32)


def _select_kernel(u_ref, k_ref, o_ref, *, n_real: int):
    """One row per program: the whole 32-step bisection over the
    VMEM-resident order bits, then the first-occurrence position of the
    selected value — a single HBM read of the row, vs. 33 for the jnp
    path. Invalid/padded entries arrive as 0xFFFFFFFF (folded by
    _order_bits), so no mask operand is needed."""
    u = u_ref[0]  # [S, 128]
    k1 = k_ref[0, 0, 0] + 1  # count of elements <= target

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((u <= mid).astype(jnp.int32))
        take = cnt >= k1
        return jnp.where(take, lo, mid + 1), jnp.where(take, mid, hi)

    lo, _ = jax.lax.fori_loop(
        0, 32,
        body,
        (jnp.uint32(0), jnp.uint32(0xFFFFFFFF)),
    )
    s, l = u.shape
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (s, l), 0) * l
        + jax.lax.broadcasted_iota(jnp.int32, (s, l), 1)
    )
    # first occurrence == min flat position among matches (argmax parity)
    idx = jnp.min(jnp.where(u == lo, flat, n_real))
    o_ref[0] = jnp.full((8, 128), idx, jnp.int32)


def _kth_valid_index_fused(u2: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Pallas row-resident selection: ``u2`` [R, N] order bits (invalid
    already folded to max), ``k`` [R] int32. Returns [R] int32 indices."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    r, n = u2.shape
    n_pad = (n + 127) // 128 * 128
    if n_pad != n:
        u2 = jnp.pad(u2, ((0, 0), (0, n_pad - n)),
                     constant_values=jnp.uint32(0xFFFFFFFF))
    s = n_pad // 128
    u3 = u2.reshape(r, s, 128)
    kb = jnp.broadcast_to(
        k.astype(jnp.int32)[:, None, None], (r, 8, 128)
    )
    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        functools.partial(_select_kernel, n_real=n),
        out_shape=jax.ShapeDtypeStruct((r, 8, 128), jnp.int32),
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, s, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(u3, kb)
    return out[:, 0, 0]


def _gather_at(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x[idx] along the last axis — the differentiable read (backward is a
    one-element scatter per row)."""
    return jnp.take_along_axis(x, idx[..., None], axis=-1)[..., 0]


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Lower median of ``x[mask]`` along the last axis; 0 where count==0
    (torch.median / nanmedian convention, train_distillation.py:490,518)."""
    count = jnp.sum(mask, axis=-1)
    u = _order_bits(x, mask)
    idx = _kth_valid_index(u, mask, jnp.maximum(count - 1, 0) // 2)
    return jnp.where(count > 0, _gather_at(x, idx), 0.0)


def median_all(x: jnp.ndarray) -> jnp.ndarray:
    """torch.median along the last axis (lower middle element)."""
    u = _order_bits(x, None)
    k = jnp.full(x.shape[:-1], (x.shape[-1] - 1) // 2, dtype=jnp.int32)
    return _gather_at(x, _kth_valid_index(u, None, k))


def masked_quantile(x: jnp.ndarray, mask: jnp.ndarray, q: float) -> jnp.ndarray:
    """torch.nanquantile along the last axis (linear interpolation);
    NaN where no valid entries."""
    count = jnp.sum(mask, axis=-1)
    pos = q * (count.astype(jnp.float32) - 1.0)
    pos = jnp.maximum(pos, 0.0)
    lo_k = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, x.shape[-1] - 1)
    hi_k = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, x.shape[-1] - 1)
    u = _order_bits(x, mask)
    v_lo = _gather_at(x, _kth_valid_index(u, mask, lo_k))
    v_hi = _gather_at(x, _kth_valid_index(u, mask, hi_k))
    frac = pos - jnp.floor(pos)
    val = v_lo + frac * (v_hi - v_lo)
    return jnp.where(count > 0, val, jnp.nan)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Mean of ``x[mask]`` along the last axis with an optional +eps count
    regularizer (the reference uses count+1 or count+1e-6 in places)."""
    s = jnp.sum(jnp.where(mask, x, 0.0), axis=-1)
    c = jnp.sum(mask, axis=-1).astype(x.dtype) + eps
    return s / c
