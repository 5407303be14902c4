"""Pallas TPU attention kernel.

The TPU-native replacement for xformers ``memory_efficient_attention``
(reference: distillanydepth/depth_anything_v2/dinov2_layers/attention.py:
65-81) and the machinery behind the windowed/nested-tensor attention paths
(ViT_DINO.py:1141-1234, block.py:154-243 — covered here by the optional
additive ``bias``, e.g. a local-window log-mask, and by padding masks).

Design (see pallas guide):

- Grid over ``(batch*heads, q_blocks)``; each program loads one q tile and
  streams the **full** K/V for that head into VMEM. ViT depth models run at
  785-1370 tokens (392-518 px), so K+V is only 0.4-0.7 MB/head — far under
  the 16 MB VMEM budget — and a single K pass with one fp32 softmax beats an
  online-softmax loop at these lengths. Scores never round-trip to HBM,
  which is the entire memory win over the naive path.
- Scores accumulate in fp32 on the MXU (``preferred_element_type``);
  softmax in fp32; the probs are cast back to the input dtype for the PV
  matmul, matching the reference numerics.
- Sequence padding to the 128-lane tile is masked with -inf columns via
  ``broadcasted_iota``.
- Backward: a blockwise Pallas kernel under ``custom_vjp`` — recompute the
  probabilities per q-tile, emit dq directly, accumulate dk/dv across the
  sequential q grid; the [B,H,N,N] logits never reach HBM in either
  direction (the einsum backward's fp32 logits alone OOM'd a bs16 392^2
  train step). Constant biases (window/segment masks — detected via
  custom_vjp ``symbolic_zeros``) run the same Pallas backward with the mask
  folded into the recompute; only a *trainable* bias falls back to einsum.
- Off-TPU the kernel runs in interpreter mode so CPU tests exercise the same
  code path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on all platforms; guard for safety
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

__all__ = ["mha_flash", "mha_flash_packed"]

_LANE = 128
# per-program VMEM budget: ~16 MB on v5e, keep headroom for Mosaic's own
# stack allocations
_VMEM_BUDGET_BYTES = 14 * 1024 * 1024
# Below this real token count the dense kernel beats the banded one even for
# narrow windows (the online-softmax accumulation overhead; measured on v5e,
# scripts/profile_banded.py).
_BANDED_MIN_SEQ = 3000


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_tiling(
    bh: int, n_pad: int, d: int, itemsize: int, with_bias: bool
) -> tuple[int, int]:
    """Choose (heads_per_program, q_block).

    Measured on v5e (B8 N785 H12 D64): bf16 multi-head tilings run 355-398 us
    vs 523 us for 1-head/256-q-block — packing heads amortizes K/V loads and
    grid overhead. Mosaic keeps each unrolled head's fp32 score/softmax
    temporaries live on the kernel stack, so fp32 inputs (parity/testing
    path) stay single-head: multi-head fp32 OOMs scoped VMEM in practice
    even when a naive estimate fits.
    """
    if itemsize >= 4:
        return 1, min(256, n_pad)
    budget = _VMEM_BUDGET_BYTES // (2 if with_bias else 1)
    for hp in (8, 4, 2, 1):
        if bh % hp:
            continue
        q_block = n_pad
        # Peak live stack per head: fp32 scores (4B) + the bf16 exp buffer
        # (2B) both live while the exp is evaluated -> 6 bytes per score
        # element, plus the double-buffered K/V stream (+ bias tile if
        # present). Exceeding this blew the 16 MB scoped-vmem limit on the
        # ViT-L train compile.
        kv_fixed = 4 * hp * n_pad * d * itemsize
        while q_block > _LANE and hp * q_block * n_pad * 6 + kv_fixed > budget:
            # keep the sublane dim 8-aligned (Mosaic block requirement;
            # halving e.g. 43*128 naively lands on 172)
            q_block = (q_block // 2 + 7) // 8 * 8
        q_block = max(q_block, _LANE)
        if hp * q_block * n_pad * 6 + kv_fixed <= budget:
            return hp, q_block
    return 1, _LANE


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, hp: int, n_real: int,
                 scale: float, bias_ref=None):
    for h in range(hp):  # static unroll over the packed heads
        q = q_ref[h]  # [Bq, D]
        k = k_ref[h]  # [Nk, D]
        v = v_ref[h]  # [Nk, D]
        scores = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [Bq, Nk] fp32
        if bias_ref is not None:
            # bias block is [1, Bq, Nk], shared by every head in the program
            scores = scores + bias_ref[0].astype(jnp.float32)
        nk = scores.shape[-1]
        if nk > n_real:  # mask padded key columns
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < n_real, scores, -jnp.inf)
        # Softmax with the 1/sum deferred past the PV matmul: dividing the
        # [Bq, D] output is a D/Nk-times smaller traversal than dividing the
        # [Bq, Nk] probs (v5e, N=785 H12 D64 bs8: 349 -> 274 us;
        # scripts/profile_softmax_variants.py). The exponentials are
        # quantized to the input dtype immediately (the PV matmul consumed
        # bf16 probs before this change too) so only one score-sized fp32
        # buffer is ever live — two of them blow the 16 MB scoped-vmem
        # stack at the trained ViT-L tiling.
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m).astype(q.dtype)
        denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e, v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[h] = (o / denom).astype(q.dtype)


def _banded_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, acc_ref,
                   m_ref, l_ref,
                   *, hp: int, n_real: int, scale: float, gw: int, half: int,
                   gh: int, q_block: int, kv_block: int, nspan: int,
                   lse_ref=None):
    """Online-softmax forward over the window band.

    Grid ``(bh/hp, nq, nspan)`` with the kv dimension innermost; the k/v/bias
    index maps slide the kv window with the q block (see ``_band_bounds``), so
    each q tile touches only ~``q_rows + window`` grid rows of K/V instead of
    the whole sequence — windowed attention finally *skips* the masked FLOPs
    rather than just masking them. Accumulator/max/sum live in VMEM scratch
    across the sequential kv iterations.
    """
    i = pl.program_id(1)
    j = pl.program_id(2)

    j0, j_hi = _band_bounds_traced(i, gw=gw, half=half, gh=gh,
                                   q_block=q_block, kv_block=kv_block)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j0 + j <= j_hi)
    def _():
        kv_start = (j0 + j) * kv_block
        for h in range(hp):
            s = jax.lax.dot_general(
                q_ref[h], k_ref[h],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # [qb, kvb]
            s = s + bias_ref[0].astype(jnp.float32)
            col = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_real, s, -jnp.inf)

            m_prev = m_ref[h]  # [qb, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            # exp(-inf - -inf) guard: fully-masked rows keep m = -inf
            corr = jnp.exp(jnp.where(m_prev == -jnp.inf, -jnp.inf, m_prev) - m_new)
            corr = jnp.where(jnp.isnan(corr), 0.0, corr)
            # rows still fully masked have m_new = -inf; exp(s - 0) = 0 there
            e = jnp.exp(
                s - jnp.where(m_new == -jnp.inf, 0.0, m_new)
            ).astype(q_ref.dtype)
            l_ref[h] = l_ref[h] * corr + jnp.sum(
                e.astype(jnp.float32), axis=-1, keepdims=True
            )
            pv = jax.lax.dot_general(
                e, v_ref[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[h] = acc_ref[h] * corr + pv
            m_ref[h] = m_new

    @pl.when(j == nspan - 1)
    def _():
        for h in range(hp):
            denom = l_ref[h]
            safe = jnp.where(denom == 0.0, 1.0, denom)  # padded q rows
            o_ref[h] = (acc_ref[h] / safe).astype(o_ref.dtype)
            if lse_ref is not None:
                # log-sum-exp per q row, saved for the banded backward's
                # probability recompute: p = exp(s - lse). +inf on fully-
                # masked rows makes their recomputed p exactly 0. Stored in
                # ROW layout [.., 1, q_block] (q rows in the lane dim): a
                # [.., q_block, 1] output block measured a 21x kernel
                # slowdown (1-lane blocks break Mosaic's pipelining).
                lse_ref[h] = jnp.swapaxes(
                    jnp.where(denom == 0.0, jnp.inf, m_ref[h] + jnp.log(safe)),
                    0, 1,
                )


def _banded_kernel_lse(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, acc_ref,
                       m_ref, l_ref, **kw):
    _banded_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, acc_ref, m_ref,
                   l_ref, lse_ref=lse_ref, **kw)


def _band_bounds_traced(i, *, gw: int, half: int, gh: int, q_block: int,
                        kv_block: int):
    """kv block range [j0, j_hi] (inclusive) for q block ``i``.

    Queries in block i cover grid rows [r0, r1]; with the reference's
    clamped-center window (ops/window.py: center clip half..gh-1-half) the
    allowed key rows are [clip(r0)-half, clip(r1)+half]."""
    r0 = (i * q_block) // gw
    r1 = ((i + 1) * q_block - 1) // gw
    lo_c = jnp.clip(r0, half, max(gh - 1 - half, half))
    hi_c = jnp.clip(r1, half, max(gh - 1 - half, half))
    lo_tok = (lo_c - half) * gw
    hi_tok = (hi_c + half + 1) * gw - 1
    return lo_tok // kv_block, hi_tok // kv_block


def _inv_band_bounds_traced(jkv, *, gw: int, half: int, gh: int, q_block: int,
                            kv_block: int):
    """q block range [i0, i_hi] (inclusive) whose band covers kv block
    ``jkv`` — the inverse of ``_band_bounds_traced``.

    Key row c is visible from query row r iff clip(r, half, gh-1-half) is
    in [c-half, c+half]: rows below the clip floor see the first
    2*half+1 key rows, rows above the ceiling see the last ones."""
    c0 = (jkv * kv_block) // gw
    c1 = ((jkv + 1) * kv_block - 1) // gw
    r_lo = jnp.where(c0 - half <= half, 0, c0 - half)
    r_hi = jnp.where(c1 + half >= gh - 1 - half, gh - 1, c1 + half)
    lo_tok = r_lo * gw
    hi_tok = (r_hi + 1) * gw - 1
    return lo_tok // q_block, hi_tok // q_block


def _banded_tiling(bh: int, n: int, d: int, itemsize: int,
                   score_bytes: int = 12, lane_stats: bool = False):
    """Shared fwd/bwd tiling for the banded kernels.

    The VMEM footprint is per-KV-BLOCK, so q blocks can be far larger than
    the dense kernel's — and should be, because each q tile pays a fixed
    ~window-rows overlap of kv rows: bigger q tiles amortize it. kv blocks
    stay small so the band is tracked tightly.

    ``score_bytes``: peak live kernel-stack bytes per score element. The
    forward keeps the fp32 scores, the fp32 exp temp and its quantized copy
    live at once (4+4+itemsize, plus slack for Mosaic's scheduling — the
    two-output form measured ~2 MB past the naive estimate); the backward
    kernels hold s/p/dp/ds fp32 tiles simultaneously (pass ~18)."""
    n_pad = _round_up(n, _LANE)
    kv_block = min(256, n_pad)
    hp = next((x for x in (8, 4, 2, 1) if bh % x == 0), 1)
    # Pallas double-buffers every streamed input block, so q/bias count
    # twice; the score-sized temporaries are the kernel-stack part.
    per_q_row = (
        hp * kv_block * score_bytes
        + 2 * kv_block * 4           # bias block, double-buffered
        + hp * d * (4 + 4 * itemsize)  # fp32 acc + double-buffered q/o
        + hp * 32                    # m/l/lse/delta rows
    )
    kv_fixed = 4 * hp * kv_block * d * itemsize  # k+v, double-buffered
    q_block = min(
        int((_VMEM_BUDGET_BYTES * 0.85 - kv_fixed) / per_q_row), n_pad
    )
    if lane_stats:
        # row-layout lse/delta blocks put q rows in the LANE dim — Mosaic
        # requires lane-dim blocks be multiples of 128
        q_block = max(q_block // _LANE * _LANE, _LANE)
    else:
        q_block = max(q_block // 8 * 8, _LANE)
    return hp, q_block, kv_block


def _kv_span(n: int, gw: int, gh: int, half: int, q_block: int,
             kv_block: int) -> int:
    """Static max kv-block span any q block's band touches."""
    nq_pad = _round_up(n, q_block)
    nspan = 0
    for i in range(nq_pad // q_block):
        r0 = (i * q_block) // gw
        r1 = min(((i + 1) * q_block - 1) // gw, gh - 1)
        lo = (max(min(r0, gh - 1 - half), half) - half) * gw
        hi = (min(max(r1, half), gh - 1 - half) + half + 1) * gw - 1
        nspan = max(nspan, hi // kv_block - lo // kv_block + 1)
    return nspan


def _q_span(n: int, gw: int, gh: int, half: int, q_block: int,
            kv_block: int) -> int:
    """Static max q-block span that can see any kv block (inverse band)."""
    nkv_pad = _round_up(n, kv_block)
    nspan = 0
    for jkv in range(nkv_pad // kv_block):
        c0 = (jkv * kv_block) // gw
        c1 = min(((jkv + 1) * kv_block - 1) // gw, gh - 1)
        r_lo = 0 if c0 - half <= half else c0 - half
        r_hi = gh - 1 if c1 + half >= gh - 1 - half else c1 + half
        lo_tok = r_lo * gw
        hi_tok = (r_hi + 1) * gw - 1
        nspan = max(nspan, hi_tok // q_block - lo_tok // q_block + 1)
    return nspan


def _pad_rows(x, target_n, value=0.0):
    if x.shape[1] == target_n:
        return x
    return jnp.pad(
        x, ((0, 0), (0, target_n - x.shape[1]), (0, 0)),
        constant_values=value,
    )


def _banded_fwd_impl(q, k, v, bias, band, interpret: bool,
                     with_lse: bool = False):
    """q/k/v: [BH, N, D] row-major over a (gh, gw) grid with NO prefix
    tokens; band = (gw, window). bias: [1, N, N] window log-mask.

    Returns ``out``, or ``(out, lse)`` when ``with_lse`` — lse is the
    per-row log-sum-exp in ROW layout [BH, 1, N] fp32, consumed by the
    banded backward (inference skips it: the extra output costs kernel
    pipelining)."""
    bh, n, d = q.shape
    gw, window = band
    gh = n // gw
    half = window // 2
    scale = d ** -0.5
    hp, q_block, kv_block = _banded_tiling(
        bh, n, d, q.dtype.itemsize,
        score_bytes=12 if with_lse else 6, lane_stats=with_lse,
    )
    nq_pad = _round_up(n, q_block)
    nspan = _kv_span(n, gw, gh, half, q_block, kv_block)

    nkv_pad = _round_up(n, kv_block)
    qp, kp, vp = (
        _pad_rows(q, nq_pad), _pad_rows(k, nkv_pad), _pad_rows(v, nkv_pad)
    )
    bias_p = jnp.pad(bias, ((0, 0), (0, nq_pad - n), (0, nkv_pad - n)))

    nkv_blocks = nkv_pad // kv_block
    bounds = functools.partial(
        _band_bounds_traced, gw=gw, half=half, gh=gh, q_block=q_block,
        kv_block=kv_block,
    )

    def kv_index(b, i, j):
        j0, j_hi = bounds(i)
        return (b, jnp.minimum(jnp.minimum(j0 + j, j_hi), nkv_blocks - 1), 0)

    def bias_index(b, i, j):
        j0, j_hi = bounds(i)
        return (0, i, jnp.minimum(jnp.minimum(j0 + j, j_hi), nkv_blocks - 1))

    common = dict(
        hp=hp, n_real=n, scale=scale, gw=gw, half=half,
        gh=gh, q_block=q_block, kv_block=kv_block, nspan=nspan,
    )
    o_spec = pl.BlockSpec((hp, q_block, d), lambda b, i, j: (b, i, 0))
    out_shape = jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype)
    if with_lse:
        kernel = functools.partial(_banded_kernel_lse, **common)
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((bh, 1, nq_pad), jnp.float32))
        out_specs = (o_spec,
                     pl.BlockSpec((hp, 1, q_block), lambda b, i, j: (b, 0, i)))
    else:
        kernel = functools.partial(_banded_kernel, **common)
        out_specs = o_spec
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(bh // hp, nq_pad // q_block, nspan),
        in_specs=[
            pl.BlockSpec((hp, q_block, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((hp, kv_block, d), kv_index),
            pl.BlockSpec((hp, kv_block, d), kv_index),
            pl.BlockSpec((1, q_block, kv_block), bias_index),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((hp, q_block, d), jnp.float32),
            pltpu.VMEM((hp, q_block, 1), jnp.float32),
            pltpu.VMEM((hp, q_block, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, bias_p)
    if with_lse:
        out, lse = res
        return out[:, :n], lse[:, :, :n]
    return res[:, :n]


def _flash_fwd_impl(q, k, v, bias, interpret: bool):
    """q/k/v: [BH, N, D] (same N), bias: [1, N, N] (shared) or None."""
    bh, n, d = q.shape
    scale = d ** -0.5
    n_pad = _round_up(n, _LANE)
    hp, q_block = _pick_tiling(bh, n_pad, d, q.dtype.itemsize, bias is not None)
    nq_pad = _round_up(n, q_block)

    def pad(x, target_n):
        if x.shape[1] == target_n:
            return x
        return jnp.pad(x, ((0, 0), (0, target_n - x.shape[1]), (0, 0)))

    qp, kp, vp = pad(q, nq_pad), pad(k, n_pad), pad(v, n_pad)

    grid = (bh // hp, nq_pad // q_block)
    in_specs = [
        pl.BlockSpec((hp, q_block, d), lambda b, i: (b, i, 0)),
        pl.BlockSpec((hp, n_pad, d), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((hp, n_pad, d), lambda b, i: (b, 0, 0)),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        # bias stays [1, N, N] in HBM (index_map pins block 0) — never
        # broadcast-materialized to [B*H, N, N] (721 MB at 518^2/B8/H12)
        assert bias.shape[0] == 1, bias.shape
        bias_p = jnp.pad(bias, ((0, 0), (0, nq_pad - n), (0, n_pad - n)))
        in_specs.append(
            pl.BlockSpec((1, q_block, n_pad), lambda b, i: (0, i, 0))
        )
        args.append(bias_p)
        kernel = functools.partial(
            _bias_kernel_adapter, hp=hp, n_real=n, scale=scale
        )
    else:
        kernel = functools.partial(_attn_kernel, hp=hp, n_real=n, scale=scale)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((hp, q_block, d), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(*args)
    return out[:, :n]


def _bias_kernel_adapter(q_ref, k_ref, v_ref, bias_ref, o_ref, *, hp, n_real, scale):
    _attn_kernel(q_ref, k_ref, v_ref, o_ref, hp=hp, n_real=n_real, scale=scale,
                 bias_ref=bias_ref)


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, hd: int, d: int,
                   n_real: int, scale: float):
    """``hd`` heads of one q tile, read/written as one 128-lane column
    group of the packed layout (static in-register 64-lane sub-slices).

    Pad-key masking zeroes the pad k/v ROWS once per grid step (one
    [nk, lanes] pass shared by all hd heads) instead of an iota+where over
    each head's [qb, nk] f32 scores: pad scores become exactly 0, so each
    pad column contributes exactly exp(-m) to the denominator, subtracted
    back in closed form — exact, not approximate (edge case where a pad 0
    is the row max included: tests/test_attention.py pad_score_is_max).
    Standalone block timing is within noise of the where-mask (~196 us
    both, scripts/profile_attn_mask.py at 400 chained iters), but the
    in-context full-model effect is large: bench headline 587.7 -> 627.6
    img/s, forward MFU 0.59 -> 0.63 (the score-mask's per-head iota+where
    constants apparently blocked fusion/scheduling around the kernel)."""
    q2 = q_ref[0]  # [qb, hd*d]
    k2 = k_ref[0]  # [nk, hd*d]
    v2 = v_ref[0]
    nk = k2.shape[0]
    n_pad = nk - n_real
    if n_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, k2.shape, 0)
        k2 = jnp.where(row < n_real, k2, 0)
        v2 = jnp.where(row < n_real, v2, 0)
    outs = []
    for hh in range(hd):
        sl = slice(hh * d, (hh + 1) * d)
        scores = jax.lax.dot_general(
            q2[:, sl], k2[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [qb, nk] fp32
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m).astype(q2.dtype)
        denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        if n_pad:
            denom = denom - n_pad * jnp.exp(-m)
        o = jax.lax.dot_general(
            e, v2[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o / denom).astype(q2.dtype))
    o_ref[0] = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


def packed_flash_eligible(b: int, c: int, d: int, itemsize: int) -> bool:
    """Can ``mha_flash_packed`` take this shape without hitting a known
    trap? Single source of truth for the dispatch gate
    (ops/attention.multi_head_attention_packed) and the kernel's own
    ValueError. Requires: bf16-width inputs (multi-head fp32 blows scoped
    VMEM — same reason _pick_tiling forces single-head there), head columns
    groupable into 128-lane blocks, and a widening solution that stays
    under the Mosaic batch*groups compile cliff (see _packed_lanes)."""
    if itemsize >= 4:
        return False
    lanes = max(_LANE // d, 1) * d
    if lanes % _LANE or c % lanes:
        return False
    return _packed_lanes(b, c, lanes) is not None


def _packed_lanes(b: int, c: int, lanes: int) -> int | None:
    """Widen the head group until batch * groups < 128, or None if no
    width dodges the cliff (measured on v5e: b*groups >= 128 jumps the
    Mosaic build from ~2 s to 467-527 s; b12/g8, b16/g6, b8/g8 ~2 s)."""
    while b * (c // lanes) >= 128:
        if c % (2 * lanes) or lanes >= 512:
            return None
        lanes *= 2
    return lanes


def _packed_fwd_impl(qkv, num_heads: int, interpret: bool,
                     n_valid: int | None = None):
    """Dense forward on head-interleaved packed qkv.

    ``qkv``: [B, N, 3*H*D], the raw fused-QKV GEMM output in the torch
    packing (branch, head, dim) — q occupies columns [0, C), k [C, 2C),
    v [2C, 3C). Output: [B, N, H*D], directly consumable by the proj GEMM.

    The point of this layout: the per-block [B,N,H,D] <-> [B*H,N,D]
    transposes plus per-tensor pads around the unpacked kernel were ~2.5 ms
    of pure copies per ViT-B 392^2 bs8 forward (profiled; ~18% of the whole
    model). Here the grid's innermost dimension walks 128-lane head groups
    and the BlockSpecs slice the *same* array at the matching column blocks
    — every DMA is a static strided read of contiguous row chunks and no
    relayout op ever exists in the graph.
    """
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    scale = d ** -0.5
    base = max(_LANE // d, 1) * d
    if base % _LANE or c % base:
        raise ValueError(
            f"packed flash needs head columns in 128-lane groups; got "
            f"H={num_heads} D={d} (C={c})"
        )
    # The VMEM/compile-cliff gates only matter on a real Mosaic build;
    # interpret mode (CPU tests) runs any width.
    if not interpret and not packed_flash_eligible(b, c, d, qkv.dtype.itemsize):
        raise ValueError(
            f"shape not packed-flash eligible (use mha_flash): "
            f"B={b} H={num_heads} D={d} C={c} itemsize={qkv.dtype.itemsize}"
        )
    # heads per column group (d=64 everywhere in this model zoo); widened
    # past 128 lanes when needed to dodge the Mosaic batch*groups>=128
    # compile cliff — wider groups also amortize kv DMAs, and the VMEM
    # sizing below accounts for the width.
    lanes = _packed_lanes(b, c, base) or base
    hd = lanes // d
    groups = c // lanes
    # kv rows sit in sublanes (the lane dim is the head group): pad N to 8.
    n_pad = _round_up(n, 8)
    kv_fixed = 4 * n_pad * lanes * qkv.dtype.itemsize  # k+v, double-buffered
    per_q_row = (
        hd * n_pad * 6                        # fp32 scores + exp buffer
        + 2 * lanes * qkv.dtype.itemsize * 2  # q and o blocks
    )
    # cap 1024: at N<=~800 a single whole-N q tile measured fastest
    # (230 vs 250-340 us for 264/400-row tiles, scripts-era sweep); VMEM
    # sizing above pushes longer sequences into multiple tiles anyway.
    q_max = max(
        min(int((_VMEM_BUDGET_BYTES - kv_fixed) / per_q_row), 1024, n_pad)
        // 8 * 8,
        8,
    )
    # Split N into the fewest tiles that fit, sized to the need: naive
    # round_up(785, 512) = 1024 would waste 30% of the rows as padding.
    num_tiles = -(-n // q_max)
    q_block = _round_up(-(-n // num_tiles), 8)
    nq_pad = _round_up(n, q_block)
    np_all = max(nq_pad, n_pad)
    qkv_p = (
        qkv if np_all == n else jnp.pad(qkv, ((0, 0), (0, np_all - n), (0, 0)))
    )
    kernel = functools.partial(
        _packed_kernel, hd=hd, d=d, n_real=n_valid or n, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nq_pad, c), qkv.dtype),
        # head groups innermost (each group reads/writes its own 128-lane
        # q/o column slice — nothing is resident across g, the win is
        # purely that no relayout/pad ops exist around the call)
        grid=(b, nq_pad // q_block, groups),
        in_specs=[
            pl.BlockSpec((1, q_block, lanes), lambda bi, i, g: (bi, i, g)),
            pl.BlockSpec((1, np_all, lanes),
                         lambda bi, i, g, _gr=groups: (bi, 0, _gr + g)),
            pl.BlockSpec((1, np_all, lanes),
                         lambda bi, i, g, _gr=groups: (bi, 0, 2 * _gr + g)),
        ],
        out_specs=pl.BlockSpec((1, q_block, lanes), lambda bi, i, g: (bi, i, g)),
        interpret=interpret,
    )(qkv_p, qkv_p, qkv_p)
    return out[:, :n]


def _packed_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                       dk_acc, dv_acc, *, hd: int, d: int, nq: int,
                       n_real: int, scale: float):
    """Backward twin of ``_packed_kernel``: one 128-lane head-group column
    of the packed qkv layout per program, per-head 64-lane sub-slices for
    the dots. The unpacked backward's operands all lived in 64-lane
    (half-empty) tiles — its five matmuls measured ~30 TF/s vs ~60 for the
    packed forward at the same ViT-B bs16 shape; reading the same
    128-lane column groups as the forward recovers that rate and deletes
    the [B,N,H,D] <-> [BH,N,D] relayouts + pads around the old path.
    dk/dv accumulate in fp32 VMEM scratch across the (innermost,
    sequential) q-tile grid dimension and hit HBM once, at the last tile,
    in the input dtype."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q2 = q_ref[0]   # [qb, hd*d]
    k2 = k_ref[0]   # [nk, hd*d]
    v2 = v_ref[0]
    do2 = do_ref[0]
    # pad-key handling mirrors _packed_kernel: zero pad k/v rows once
    # (shared by all hd heads), correct l in closed form. The pad columns
    # of t are then -exp(-m)*delta (nonzero), but they only touch the pad
    # ROWS of dk/dv (discarded at the output slice) and multiply zeroed k
    # rows in dq — exact.
    nk_rows = k2.shape[0]
    kv_pad = nk_rows - n_real
    if kv_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, k2.shape, 0)
        k2 = jnp.where(row < n_real, k2, 0)
        v2 = jnp.where(row < n_real, v2, 0)
    dq_parts, dk_parts, dv_parts = [], [], []
    for hh in range(hd):
        sl = slice(hh * d, (hh + 1) * d)
        q = q2[:, sl]
        k = k2[:, sl]
        v = v2[:, sl]
        do = do2[:, sl]

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [qb, nk] fp32
        # deferred-divide softmax: unnormalized exp quantizes to the input
        # dtype immediately; 1/l folds into per-ROW scales on the [*, D]
        # side of each matmul (see _bwd_kernel for the algebra)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(q.dtype)  # [qb, nk]
        l = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        if kv_pad:
            l = l - kv_pad * jnp.exp(-m)
        inv_l = 1.0 / l

        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [qb, nk] fp32
        edp = e.astype(jnp.float32) * dp
        delta = jnp.sum(edp, axis=-1, keepdims=True) * inv_l
        t = (edp - e.astype(jnp.float32) * delta).astype(q.dtype)

        rs = (scale * inv_l).astype(jnp.float32)  # [qb, 1]
        dq_parts.append((
            jax.lax.dot_general(
                t, k, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * rs
        ).astype(q.dtype))
        dk_parts.append(jax.lax.dot_general(
            t, (q.astype(jnp.float32) * rs).astype(q.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # [nk, d] fp32
        dv_parts.append(jax.lax.dot_general(
            e, (do.astype(jnp.float32) * inv_l).astype(q.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))

    def cat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)

    dq_ref[0] = cat(dq_parts)
    # one aligned full-width accumulate per tile (not hd 64-lane stores)
    dk_acc[...] += cat(dk_parts)
    dv_acc[...] += cat(dv_parts)

    @pl.when(i == nq - 1)
    def _():
        dk_full = dk_acc[...]
        dv_full = dv_acc[...]
        if kv_pad:
            # e/t pad COLUMNS accumulate into pad dk/dv rows; the packed
            # output keeps all rows, and upstream (QKV GEMM backward) must
            # see exactly-zero pad-row cotangents — mask once at the final
            # write, not per q-tile/head.
            rmask = jax.lax.broadcasted_iota(jnp.int32, dk_full.shape, 0)
            dk_full = jnp.where(rmask < n_real, dk_full, 0)
            dv_full = jnp.where(rmask < n_real, dv_full, 0)
        dk_ref[0] = dk_full.astype(dk_ref.dtype)
        dv_ref[0] = dv_full.astype(dv_ref.dtype)


def _packed_bwd_impl(qkv, g, num_heads: int, interpret: bool,
                     n_valid: int | None = None):
    """dqkv for ``_packed_fwd_impl``, straight on the packed layouts.

    ``qkv``: [B, N, 3C] (fwd residual), ``g``: [B, N, C] output cotangent.
    Returns [B, N, 3C]: dq/dk/dv column blocks written by the kernel in
    the same packing and concatenated once (the only relayout left; XLA
    fuses it into the QKV-GEMM backward's reads)."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    scale = d ** -0.5
    base = max(_LANE // d, 1) * d
    lanes = _packed_lanes(b, c, base) or base
    hd = lanes // d
    groups = c // lanes
    itemsize = qkv.dtype.itemsize
    g = g.astype(qkv.dtype)

    n8 = _round_up(n, 8)
    # resident per program: k+v blocks (double-buffered across g), dk/dv
    # out blocks, fp32 dk/dv scratch
    fixed = (
        2 * n8 * lanes * itemsize * 2
        + 2 * n8 * lanes * itemsize
        + 2 * n8 * lanes * 4
    )
    # streamed q/do/dq rows + Mosaic stack for the score-sized
    # temporaries (s, e, dp, edp, t per head ~= 16 B/elem + margin)
    per_q_row = 3 * lanes * itemsize * 2 + hd * n8 * 20
    q_max = max(
        min(int((_VMEM_BUDGET_BYTES - fixed) / per_q_row), 1024, n8)
        // 8 * 8,
        8,
    )
    num_tiles = -(-n // q_max)
    q_block = _round_up(-(-n // num_tiles), 8)
    nq_pad = _round_up(n, q_block)
    np_all = max(nq_pad, n8)
    if np_all != n:
        qkv = jnp.pad(qkv, ((0, 0), (0, np_all - n), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, np_all - n), (0, 0)))
    kernel = functools.partial(
        _packed_bwd_kernel, hd=hd, d=d, nq=nq_pad // q_block,
        n_real=n_valid or n, scale=scale,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, np_all, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, np_all, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, np_all, c), qkv.dtype),
        ),
        grid=(b, groups, nq_pad // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, lanes), lambda bi, gr, i: (bi, i, gr)),
            pl.BlockSpec((1, np_all, lanes),
                         lambda bi, gr, i, _g=groups: (bi, 0, _g + gr)),
            pl.BlockSpec((1, np_all, lanes),
                         lambda bi, gr, i, _g=groups: (bi, 0, 2 * _g + gr)),
            pl.BlockSpec((1, q_block, lanes), lambda bi, gr, i: (bi, i, gr)),
        ],
        out_specs=(
            pl.BlockSpec((1, q_block, lanes), lambda bi, gr, i: (bi, i, gr)),
            pl.BlockSpec((1, np_all, lanes), lambda bi, gr, i: (bi, 0, gr)),
            pl.BlockSpec((1, np_all, lanes), lambda bi, gr, i: (bi, 0, gr)),
        ),
        scratch_shapes=[
            _VMEM((np_all, lanes), jnp.float32),
            _VMEM((np_all, lanes), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv, g)
    return jnp.concatenate([dq[:, :n], dk[:, :n], dv[:, :n]], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _flash_packed(qkv, num_heads, interpret, n_valid):
    return _packed_fwd_impl(qkv, num_heads, interpret, n_valid)


def _flash_packed_fwd(qkv, num_heads, interpret, n_valid):
    return _packed_fwd_impl(qkv, num_heads, interpret, n_valid), (qkv,)


def _flash_packed_bwd(num_heads, interpret, n_valid, residuals, g):
    (qkv,) = residuals
    return (_packed_bwd_impl(qkv, g, num_heads, interpret, n_valid)
            .astype(qkv.dtype),)


def _flash_packed_bwd_unpacked(num_heads, interpret, residuals, g):
    # pre-round-3 fallback, kept for A/B profiling
    # (scripts/profile_bwd_sweep.py): unpack to [BH,N,D], run the dense
    # backward, repack — pays 8 relayout/pad passes per call.
    (qkv,) = residuals
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    qkv5 = qkv.reshape(b, n, 3, num_heads, d)

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * num_heads, n, d)

    q, k, v = (fold(qkv5[:, :, i]) for i in range(3))
    gf = fold(g.reshape(b, n, num_heads, d))
    dq, dk, dv = _flash_bwd_impl(q, k, v, gf, interpret)

    def unfold(x):
        return x.reshape(b, num_heads, n, d).transpose(0, 2, 1, 3)

    dqkv = jnp.stack([unfold(dq), unfold(dk), unfold(dv)], axis=2)
    return (dqkv.reshape(b, n, c3).astype(qkv.dtype),)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def mha_flash_packed(
    qkv: jnp.ndarray, num_heads: int, interpret: bool | None = None,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """Flash attention straight on the fused-QKV GEMM output.

    ``qkv``: [B, N, 3*H*D] in the torch (branch, head, dim) column packing
    (models/vit.Attention); returns [B, N, H*D]. Bias-free dense attention
    only — windowed/banded/packed-segment paths use ``mha_flash``.

    ``n_valid`` (static): only the first ``n_valid`` rows are real tokens —
    key/value rows at or beyond it are masked out exactly (-inf scores) in
    both the forward and the recomputed backward probabilities. This is how
    the encoder carries an 8-aligned padded token count end-to-end instead
    of paying a whole-tensor jnp.pad around every block's kernel call
    (~77 MB copied per ViT-L block at bs16 392^2 for a 785->792 pad).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    if n_valid is not None and not 0 < n_valid <= qkv.shape[1]:
        raise ValueError(f"n_valid {n_valid} out of range for N={qkv.shape[1]}")
    return _flash_packed(qkv, num_heads, interpret,
                         None if n_valid == qkv.shape[1] else n_valid)


def _reference_attention(q, k, v, bias):
    """Einsum fallback/backward on [BH, N, D]."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bnd,bmd->bnm", q * scale, k).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bnm,bmd->bnd", probs, v)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *,
                hp: int, nq: int, n_real: int, scale: float, bias_ref=None):
    """Blockwise attention backward: recomputes each q-tile's probabilities
    and accumulates dk/dv across the (sequential) q-grid dimension — no
    [N, N] logits ever reach HBM. ``hp`` heads run per program (the k/v
    blocks and dk/dv output blocks stay VMEM-resident across the q grid;
    packing heads cut the program count 8x and the per-block backward
    1.7 -> ~0.5 ms at ViT-B bs16 — the kernel was program-overhead-bound).
    The optional bias block (window log-mask / packed-segment mask) enters
    the recomputed logits exactly as in the forward; it is treated as a
    constant (no dbias accumulation here — trainable biases take the
    einsum fallback, see _flash_bwd)."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    for h in range(hp):  # static unroll over the packed heads
        q = q_ref[h]
        k = k_ref[h]
        v = v_ref[h]
        do = do_ref[h]

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        if s.shape[-1] > n_real:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_real, s, -jnp.inf)
        # Deferred-divide softmax, like the forward: the unnormalized
        # exp quantizes to the input dtype immediately (one fp32
        # score-sized buffer live instead of a full fp32 softmax), and the
        # 1/l normalization folds into per-ROW scales applied on the tiny
        # [Bq, D] side of each matmul:
        #   p = e/l;  ds = p (dp - delta) scale = t * (scale/l),
        #   dq = (t k) * (scale/l)    [row scale after]
        #   dk = t^T (q * scale/l)    [row scale into q]
        #   dv = e^T (do / l)         [row scale into do]
        # with t = e (dp - delta), delta = rowsum(e dp)/l.
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(q.dtype)  # [Bq, Nk] input dtype
        l = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        inv_l = 1.0 / l

        dp = jax.lax.dot_general(
            do, v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Bq, Nk] fp32 accumulate from input-dtype operands
        edp = e.astype(jnp.float32) * dp
        delta = jnp.sum(edp, axis=-1, keepdims=True) * inv_l
        t = (edp - e.astype(jnp.float32) * delta).astype(q.dtype)

        rs = (scale * inv_l).astype(jnp.float32)  # [Bq, 1]
        dq_ref[h] = (
            jax.lax.dot_general(
                t, k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * rs
        ).astype(q.dtype)

        # fp32 accumulation in VMEM scratch; the HBM outputs are written
        # ONCE at the last q tile in the INPUT dtype — writing fp32
        # outputs per b (88 MB/block at ViT-B bs16) plus the downstream
        # cast pass made the backward HBM-bound
        dk_acc[h] += jax.lax.dot_general(
            t, (q.astype(jnp.float32) * rs).astype(q.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Nk, D] fp32
        dv_acc[h] += jax.lax.dot_general(
            e, (do.astype(jnp.float32) * inv_l).astype(q.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Nk, D] fp32

    @pl.when(i == nq - 1)
    def _():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, dout, interpret: bool, bias=None):
    bh, n, d = q.shape
    scale = d ** -0.5
    n_pad = _round_up(n, _LANE)
    itemsize = q.dtype.itemsize

    # Choose (heads_per_program, q_block) minimizing the PROGRAM COUNT
    # under VMEM: the kernel is program-overhead-bound (768 1-head programs
    # measured ~1.7 ms/block vs ~100 us of FLOPs at ViT-B bs16). k/v and
    # the fp32 dk/dv output blocks stay resident per (b) across the
    # sequential q grid; the score-sized kernel-stack temporaries scale
    # with hp*q_block, so fewer resident heads buy bigger q tiles — the
    # search just takes the best trade. Per-element stack cost calibrated
    # from a measured Mosaic VMEM OOM (~40 B/elem before the deferred-
    # divide rewrite; ~24 after, margin included).
    score_bytes = 24
    bias_row = 2 * n_pad * 4 if bias is not None else 0
    best = None
    for cand in (8, 4, 2, 1):
        if bh % cand:
            continue
        resident = (
            2 * cand * n_pad * d * itemsize      # k + v
            + 2 * cand * n_pad * d * 4           # fp32 dk/dv scratch
            + 2 * cand * n_pad * d * itemsize    # dk/dv out blocks
        )

        def fits(qb, cand=cand, resident=resident):
            streamed = 4 * cand * qb * d * itemsize * 2 + qb * bias_row
            stack = cand * qb * n_pad * score_bytes
            return resident + streamed + stack <= _VMEM_BUDGET_BYTES
        qb = n_pad
        while qb > 8 and not fits(qb):
            qb = (qb // 2 + 7) // 8 * 8
        if not fits(qb):
            continue
        programs = (bh // cand) * (-(-n // qb))
        if best is None or programs < best[0]:
            best = (programs, cand, qb)
    _, hp, q_block = best if best else (bh, 1, min(128, n_pad))
    num_tiles = -(-n // q_block)
    q_block = _round_up(-(-n // num_tiles), 8)  # split-to-fit, less padding
    nq_pad = _round_up(n, q_block)

    def pad(x, target_n):
        if x.shape[1] == target_n:
            return x
        return jnp.pad(x, ((0, 0), (0, target_n - x.shape[1]), (0, 0)))

    qp, kp, vp, dop = pad(q, nq_pad), pad(k, n_pad), pad(v, n_pad), pad(dout, nq_pad)

    in_specs = [
        pl.BlockSpec((hp, q_block, d), lambda b, i: (b, i, 0)),
        pl.BlockSpec((hp, n_pad, d), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((hp, n_pad, d), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((hp, q_block, d), lambda b, i: (b, i, 0)),
    ]
    args = [qp, kp, vp, dop]
    if bias is not None:
        # like the forward: the [1, N, N] mask stays unbroadcast in HBM,
        # each program reads its [1, q_block, n_pad] tile
        bias_p = jnp.pad(bias, ((0, 0), (0, nq_pad - n), (0, n_pad - n)))
        in_specs.append(pl.BlockSpec((1, q_block, n_pad), lambda b, i: (0, i, 0)))
        args.append(bias_p)
        kernel = functools.partial(
            _bwd_bias_kernel_adapter, hp=hp, nq=nq_pad // q_block,
            n_real=n, scale=scale,
        )
    else:
        kernel = functools.partial(
            _bwd_kernel, hp=hp, nq=nq_pad // q_block, n_real=n, scale=scale
        )

    from jax.experimental.pallas import tpu as _pltpu

    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ),
        grid=(bh // hp, nq_pad // q_block),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((hp, q_block, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((hp, n_pad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((hp, n_pad, d), lambda b, i: (b, 0, 0)),
        ),
        scratch_shapes=[
            _pltpu.VMEM((hp, n_pad, d), jnp.float32),
            _pltpu.VMEM((hp, n_pad, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return dq[:, :n], dk[:, :n], dv[:, :n]


def _bwd_bias_kernel_adapter(q_ref, k_ref, v_ref, do_ref, bias_ref,
                             dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                             hp, nq, n_real, scale):
    _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, hp=hp, nq=nq, n_real=n_real, scale=scale,
                bias_ref=bias_ref)


def _banded_tile_grads(h, q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                       delta_ref, kv_start, n_real: int, scale: float):
    """Shared per-(head, tile) math of both banded backward kernels:
    recompute this tile's probabilities from the saved row log-sum-exp and
    return ``(p, ds, dof)`` — everything dq/dk/dv need. ``lse_ref``/
    ``delta_ref`` hold the per-q-row stats in ROW layout [hp, 1, q_block]
    (see _banded_kernel)."""
    s = jax.lax.dot_general(
        q_ref[h], k_ref[h],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [qb, kvb] fp32
    s = s + bias_ref[0].astype(jnp.float32)
    col = kv_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_real, s, -jnp.inf)
    # exact softmax via the forward's stats: lse=+inf on fully-masked or
    # padded rows makes p identically 0 there
    p = jnp.exp(s - jnp.swapaxes(lse_ref[h], 0, 1))  # fp32
    dp = jax.lax.dot_general(
        do_ref[h], v_ref[h],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [qb, kvb] fp32 accumulate from input-dtype operands
    ds = p * (dp - jnp.swapaxes(delta_ref[h], 0, 1)) * scale
    # quantize the score-sized operands to the input dtype: the dk/dv/dq
    # dots then run at full bf16 MXU rate (fp32 operands measured ~8x
    # slower end-to-end: 30.4 -> 4.9 ms fwd+bwd at the 74x74 grid);
    # accumulation stays fp32 via preferred_element_type, and for fp32
    # inputs (parity tests) the casts are identity
    return p.astype(q_ref.dtype), ds.astype(q_ref.dtype), do_ref[h]


def _banded_dq_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, acc_ref, *, hp: int, n_real: int,
                      scale: float, gw: int, half: int, gh: int, q_block: int,
                      kv_block: int, nspan: int):
    """dq over the band: same sliding kv index maps as the forward;
    dq accumulates in VMEM scratch across the (sequential) kv span."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    j0, j_hi = _band_bounds_traced(i, gw=gw, half=half, gh=gh,
                                   q_block=q_block, kv_block=kv_block)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j0 + j <= j_hi)
    def _():
        kv_start = (j0 + j) * kv_block
        for h in range(hp):
            _, ds, _ = _banded_tile_grads(
                h, q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                delta_ref, kv_start, n_real, scale,
            )
            acc_ref[h] += jax.lax.dot_general(
                ds, k_ref[h],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [qb, D]

    @pl.when(j == nspan - 1)
    def _():
        for h in range(hp):
            dq_ref[h] = acc_ref[h].astype(dq_ref.dtype)


def _banded_dkv_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, hp: int,
                       n_real: int, scale: float, gw: int, half: int, gh: int,
                       q_block: int, kv_block: int, nspan: int):
    """dk/dv over the inverse band: this program's kv block stays resident;
    the q/do/lse/delta tiles slide over the q blocks that can see it."""
    jkv = pl.program_id(1)
    jj = pl.program_id(2)
    i0, i_hi = _inv_band_bounds_traced(jkv, gw=gw, half=half, gh=gh,
                                       q_block=q_block, kv_block=kv_block)

    @pl.when(jj == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(i0 + jj <= i_hi)
    def _():
        kv_start = jkv * kv_block
        for h in range(hp):
            p, ds, dof = _banded_tile_grads(
                h, q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                delta_ref, kv_start, n_real, scale,
            )
            dk_acc[h] += jax.lax.dot_general(
                ds, q_ref[h],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [kvb, D]
            dv_acc[h] += jax.lax.dot_general(
                p, dof,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [kvb, D]

    @pl.when(jj == nspan - 1)
    def _():
        for h in range(hp):
            dk_ref[h] = dk_acc[h]
            dv_ref[h] = dv_acc[h]


def _banded_bwd_impl(q, k, v, bias, do, lse, delta, band, interpret: bool):
    """Banded attention backward: both kernels only visit the band, so the
    windowed backward is O(N * band) like the forward (the dense blockwise
    backward re-ran the full O(N^2) under the mask — and cannot even
    compile at the 74x74 grid: its full-row bias tile alone needs 27 MB of
    VMEM). ``lse``/``delta`` are [BH, 1, N] fp32 row-layout stats: the
    forward's log-sum-exp and rowsum(do * o)."""
    bh, n, d = q.shape
    gw, window = band
    gh = n // gw
    half = window // 2
    scale = d ** -0.5
    # s/p/dp/ds fp32 tiles live together in the backward kernels
    hp, q_block, kv_block = _banded_tiling(
        bh, n, d, q.dtype.itemsize, score_bytes=18, lane_stats=True
    )
    nq_pad = _round_up(n, q_block)
    nkv_pad = _round_up(n, kv_block)
    nspan_kv = _kv_span(n, gw, gh, half, q_block, kv_block)
    nspan_q = _q_span(n, gw, gh, half, q_block, kv_block)
    nq_blocks = nq_pad // q_block
    nkv_blocks = nkv_pad // kv_block

    qp, dop = _pad_rows(q, nq_pad), _pad_rows(do, nq_pad)
    kp, vp = _pad_rows(k, nkv_pad), _pad_rows(v, nkv_pad)
    # +inf lse on padded q rows -> their recomputed p is exactly 0
    lsep = jnp.pad(lse, ((0, 0), (0, 0), (0, nq_pad - n)),
                   constant_values=jnp.inf)
    deltap = jnp.pad(delta, ((0, 0), (0, 0), (0, nq_pad - n)))
    bias_p = jnp.pad(bias, ((0, 0), (0, nq_pad - n), (0, nkv_pad - n)))

    bounds = functools.partial(
        _band_bounds_traced, gw=gw, half=half, gh=gh, q_block=q_block,
        kv_block=kv_block,
    )
    inv_bounds = functools.partial(
        _inv_band_bounds_traced, gw=gw, half=half, gh=gh, q_block=q_block,
        kv_block=kv_block,
    )

    def kv_index(b, i, j):
        j0, j_hi = bounds(i)
        return (b, jnp.minimum(jnp.minimum(j0 + j, j_hi), nkv_blocks - 1), 0)

    def bias_index(b, i, j):
        j0, j_hi = bounds(i)
        return (0, i, jnp.minimum(jnp.minimum(j0 + j, j_hi), nkv_blocks - 1))

    def q_row_index(b, i, j):
        return (b, i, 0)

    common = dict(
        hp=hp, n_real=n, scale=scale, gw=gw, half=half, gh=gh,
        q_block=q_block, kv_block=kv_block,
    )
    dq = pl.pallas_call(
        functools.partial(_banded_dq_kernel, nspan=nspan_kv, **common),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        grid=(bh // hp, nq_blocks, nspan_kv),
        in_specs=[
            pl.BlockSpec((hp, q_block, d), q_row_index),
            pl.BlockSpec((hp, kv_block, d), kv_index),
            pl.BlockSpec((hp, kv_block, d), kv_index),
            pl.BlockSpec((1, q_block, kv_block), bias_index),
            pl.BlockSpec((hp, q_block, d), q_row_index),
            pl.BlockSpec((hp, 1, q_block), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((hp, 1, q_block), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((hp, q_block, d), q_row_index),
        scratch_shapes=[pltpu.VMEM((hp, q_block, d), jnp.float32)],
        interpret=interpret,
    )(qp, kp, vp, bias_p, dop, lsep, deltap)

    def q_inv_index(b, jkv, jj):
        i0, i_hi = inv_bounds(jkv)
        return (b, jnp.minimum(jnp.minimum(i0 + jj, i_hi), nq_blocks - 1), 0)

    def q_stats_inv_index(b, jkv, jj):
        i0, i_hi = inv_bounds(jkv)
        return (b, 0, jnp.minimum(jnp.minimum(i0 + jj, i_hi), nq_blocks - 1))

    def bias_inv_index(b, jkv, jj):
        i0, i_hi = inv_bounds(jkv)
        return (0, jnp.minimum(jnp.minimum(i0 + jj, i_hi), nq_blocks - 1), jkv)

    def kv_self_index(b, jkv, jj):
        return (b, jkv, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_banded_dkv_kernel, nspan=nspan_q, **common),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nkv_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nkv_pad, d), jnp.float32),
        ),
        grid=(bh // hp, nkv_blocks, nspan_q),
        in_specs=[
            pl.BlockSpec((hp, q_block, d), q_inv_index),
            pl.BlockSpec((hp, kv_block, d), kv_self_index),
            pl.BlockSpec((hp, kv_block, d), kv_self_index),
            pl.BlockSpec((1, q_block, kv_block), bias_inv_index),
            pl.BlockSpec((hp, q_block, d), q_inv_index),
            pl.BlockSpec((hp, 1, q_block), q_stats_inv_index),
            pl.BlockSpec((hp, 1, q_block), q_stats_inv_index),
        ],
        out_specs=(
            pl.BlockSpec((hp, kv_block, d), kv_self_index),
            pl.BlockSpec((hp, kv_block, d), kv_self_index),
        ),
        scratch_shapes=[
            pltpu.VMEM((hp, kv_block, d), jnp.float32),
            pltpu.VMEM((hp, kv_block, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, bias_p, dop, lsep, deltap)

    return (
        dq[:, :n],
        dk[:, :n].astype(k.dtype),
        dv[:, :n].astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, bias, interpret, band=None):
    if band is not None and bias is not None:
        return _banded_fwd_impl(q, k, v, bias, band, interpret)
    return _flash_fwd_impl(q, k, v, bias, interpret)


def _flash_fwd(q, k, v, bias, interpret, band=None):
    # symbolic_zeros=True: args arrive as CustomVJPPrimal(value, perturbed).
    # bias.perturbed tells us whether anything differentiates the bias — for
    # the framework's constant window/segment masks it never does, so the
    # backward can stay fully in Pallas with no dbias.
    bias_value = None if bias is None else bias.value
    bias_perturbed = False if bias is None else bias.perturbed
    if band is not None and bias_value is not None:
        # keep out + lse as residuals: the banded backward recomputes band
        # probabilities from lse and gets delta = rowsum(do*o) from out —
        # both O(N), far cheaper than a second stats pass
        out, lse = _banded_fwd_impl(q.value, k.value, v.value, bias_value,
                                    band, interpret, with_lse=True)
        return out, (q.value, k.value, v.value, bias_value, bias_perturbed,
                     out, lse)
    out = _flash_fwd_impl(q.value, k.value, v.value, bias_value, interpret)
    return out, (q.value, k.value, v.value, bias_value, bias_perturbed,
                 None, None)


def _flash_bwd(interpret, band, residuals, g):
    q, k, v, bias, bias_perturbed, out, lse = residuals
    if not bias_perturbed:
        if band is not None and bias is not None and lse is not None:
            # Banded backward: dq over the sliding band, dk/dv over the
            # inverse band — O(N * band) FLOPs and DMAs, matching the
            # forward (the dense blockwise backward below is O(N^2) even
            # under the window mask).
            # row layout [BH, 1, N] to match the lse blocks
            delta = jnp.sum(
                g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
            )[:, None, :]
            dq, dk, dv = _banded_bwd_impl(
                q, k, v, bias, g, lse, delta, band, interpret
            )
        else:
            # Blockwise Pallas backward: recompute per q-tile (bias
            # included), accumulate dk/dv over the sequential grid. Keeps
            # the [BH, N, N] logits out of HBM (at ViT-B 392^2 bs16 the
            # einsum backward's two fp32 logits buffers alone are >1 GB and
            # OOM'd the chip).
            dq, dk, dv = _flash_bwd_impl(q, k, v, g, interpret, bias=bias)
        dbias = None
        if bias is not None:
            from jax.custom_derivatives import SymbolicZero

            dbias = SymbolicZero(jax.core.ShapedArray(bias.shape, bias.dtype))
        return dq, dk, dv, dbias

    # Trainable bias (not used by the built-in masks): einsum recompute —
    # the only path that materializes [BH, N, N], and the only one that
    # needs a real dbias.
    def f(q, k, v, bias):
        return _reference_attention(q, k, v, bias)

    _, vjp = jax.vjp(f, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias


_flash.defvjp(_flash_fwd, _flash_bwd, symbolic_zeros=True)


def mha_flash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    interpret: bool | None = None,
    band: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Flash attention over ``[B, N, H, D]`` tensors (layout of
    models/vit.Attention). ``bias``: optional additive ``[N, N]`` or
    ``[H, N, N]`` (e.g. local-window log-mask), broadcast over batch.

    ``band=(gw, window)`` asserts the tokens are a row-major ``(N/gw, gw)``
    grid with no prefix tokens and the bias is the clamped-center local
    window mask of that width (ops/window.local_window_bias) — the forward
    then runs the banded kernel that only visits the ~``q_rows + window``
    kv rows each q tile can see, skipping the masked FLOPs entirely."""
    b, n, h, d = q.shape
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    bias_f = None
    if bias is not None:
        if bias.ndim == 2:
            bias_f = bias[None]  # [1, N, N]: shared across batch and heads
        elif bias.ndim == 3 and bias.shape[0] == 1:
            bias_f = bias
        elif bias.ndim == 3:  # per-head bias: rare, einsum path handles it
            from distill_any_depth_tpu.ops.attention import mha_reference

            return mha_reference(q, k, v, bias[None])
        else:
            raise ValueError(f"bias shape {bias.shape}")

    if band is not None and (
        n % band[0] or bias_f is None or n < _BANDED_MIN_SEQ
    ):
        # Prefix tokens / no mask -> dense kernel. Short sequences too: the
        # online-softmax accumulation costs more than it saves until the
        # band covers well under half the rows (measured: banded is 0.5-0.7x
        # dense at N=784-1369, >2x from N~5000; scripts/profile_banded.py).
        band = None
    out = _flash(fold(q), fold(k), fold(v), bias_f, interpret, band)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
