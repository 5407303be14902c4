"""Fused Pallas kernel for the DPT head tail (inference / teacher forwards).

Computes, in one kernel, the chain that ends every DPT head
(reference: distillanydepth/depth_anything_v2/dpt.py:141-182 —
refinenet1's 2x bilinear upsample, output_conv1 3x3, the align_corners
upsample to the patch-grid resolution, output_conv2's 3x3 + ReLU + 1x1):

    t [B, ht, wt, C] -> resize x2 -> conv3x3(C->C/2) -> resize (oh, ow)
      -> conv3x3(C/2->32) -> relu -> dense(32->1) [-> relu]

Why a kernel: the XLA path runs this through the phase-packed blocking
(ops/resize.resize_2d_packed + models/dpt.FusedConv3x3) whose GEMMs are
fast, but XLA's layout assignment inserts relayout copies between the
einsum resizes and the convs (~1.6 ms of `copy` rows in a bs8 392^2
forward trace; logical dim-order surgery measurably cannot remove them —
a batched-dot reformulation that eliminated every logical transpose still
traced 0.4 ms SLOWER because the copies are layout, not order). Inside
one Pallas program the whole tile pipeline lives in VMEM with layouts
fixed by construction: HBM traffic is one read of ``t`` and one write of
the depth tile, nothing else.

Semantics are exactly the spatial chain (`tail_reference` below; tested
against the packed path and the plain conv chain). The resize row
matrices are sliced per output-row tile at trace time, with zero rows
standing in for the convs' zero padding at image borders.

Forward-only by design: gradient paths keep the packed XLA tail
(models/dpt.DPTHead tail_impl="packed") — a custom backward here would
recompute the XLA chain anyway. Used for the inference CLI, the
pseudo-label path, and the stop-gradient teacher forwards inside the
distillation step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from distill_any_depth_tpu.ops.resize import resize_2d, resize_matrix

__all__ = [
    "fused_dpt_tail",
    "fused_dpt_tail_v2",
    "fused_tail_supported",
    "fused_tail_supported_v2",
    "tail_reference",
]

_VMEM_BUDGET = 14 * 1024 * 1024
_VMEM_BUDGET_V2 = 13 * 1024 * 1024


def tail_reference(t, out_hw, k1, b1, k2, b2, kd, bd, *, trailing_relu,
                   dtype):
    """Plain-jnp tail (the exact spatial chain the kernel implements)."""
    u = resize_2d(t, (2 * t.shape[1], 2 * t.shape[2]), "bilinear",
                  align_corners=True)
    v = jax.lax.conv_general_dilated(
        u, k1.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b1.astype(dtype)
    w = resize_2d(v, out_hw, "bilinear", align_corners=True)
    z = jax.lax.conv_general_dilated(
        w, k2.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b2.astype(dtype)
    z = jax.nn.relu(z)
    d = jnp.dot(z, kd.astype(dtype)) + bd.astype(dtype)
    if trailing_relu:
        d = jax.nn.relu(d)
    return d[..., 0]


def _pad128(n: int) -> int:
    return max(128, ((n + 127) // 128) * 128)


@functools.lru_cache(maxsize=64)
def _tail_plan(ht: int, oh: int, ty: int):
    """Per-tile resize row-matrix slabs (numpy, trace time).

    Returns (tu, tv, R1 [n, TU, ht], R2 [n, TW, TV]) where tile i computes
    output rows [i*ty, (i+1)*ty): R2 maps its TV-row local window of v
    (= mid-resolution) rows to the tile's TY+2 conv2 input rows (zero rows
    where the row falls outside the image = the conv's zero padding), and
    R1 maps the full ``ht`` input rows to the TV+2 conv1 input rows.
    """
    hu = 2 * ht
    r1 = resize_matrix(ht, hu, "bilinear", True)   # [hu, ht]
    r2 = resize_matrix(hu, oh, "bilinear", True)   # [oh, hu]
    n = -(-oh // ty)  # ceil: the partial last block's rows are masked out
    tw = ty + 2
    # v windows per tile
    v0s, v1s = [], []
    for i in range(n):
        rows = [r for r in range(i * ty - 1, i * ty + ty + 1) if 0 <= r < oh]
        taps = np.nonzero(r2[rows].any(axis=0))[0]
        v0s.append(int(taps.min()))
        v1s.append(int(taps.max()))
    tv = max(b - a + 1 for a, b in zip(v0s, v1s))
    v0s = [min(a, hu - tv) for a in v0s]
    tu = tv + 2
    R1 = np.zeros((n, tu, ht), np.float32)
    R2 = np.zeros((n, tw, tv), np.float32)
    for i in range(n):
        v0 = v0s[i]
        for k in range(tu):
            g = v0 - 1 + k
            if 0 <= g < hu:
                R1[i, k] = r1[g]
        for j in range(tw):
            g = i * ty - 1 + j
            if 0 <= g < oh:
                R2[i, j] = r2[g, v0 : v0 + tv]
    return tu, tv, R1, R2


def _vmem_estimate(ht, wt, ci, cm, c2, tu, tv, tw, ty, ow, itemsize):
    wu = 2 * wt
    wup = _pad128(wu + 2)
    owp = _pad128(ow + 2)
    return (
        ht * wt * ci * itemsize            # t slab
        + tu * wt * ci * (4 + itemsize)    # A (f32 out + cast)
        + tu * ci * wup * (4 + itemsize)   # B (padded-row r1w product)
        + tv * wu * cm * (4 + itemsize)    # v acc + cast
        + tv * cm * owp * (4 + itemsize)   # xw (W-resize-2 product)
        + tw * cm * owp * (4 + itemsize)   # x (H-mix-2 product)
        + ty * ow * c2 * 4                 # z acc
        + ty * ow * 4                      # out tile
        + tu * ht * 4 + tw * tv * 4        # R1/R2 tile slabs (f32)
        + wup * wt * 4 + owp * wu * 4      # r1w/r2w (f32)
        + 9 * ci * cm * itemsize + 9 * cm * c2 * itemsize  # conv weights
    )


def _pick_tile(ht: int, wt: int, ci: int, oh: int, ow: int, cm: int,
               c2: int, itemsize: int) -> int:
    """Largest output-row tile dividing ``oh`` whose working set fits VMEM.

    Mosaic requires the output block's second-minor dim to be divisible by
    8 — or equal to the full array dim — so candidates are multiples of 8
    (the grid ceil-divides; the partial last block's rows are masked) plus
    ``oh`` itself for small heads."""
    cands = list(range(64, 7, -8))
    if oh <= 64:
        cands = [oh] + [t for t in cands if t < oh]
    for ty in cands:
        tu, tv, _, _ = _tail_plan(ht, oh, ty)
        if _vmem_estimate(ht, wt, ci, cm, c2, tu, tv, ty + 2, ty, ow,
                          itemsize) <= _VMEM_BUDGET:
            return ty
    return 0


def fused_tail_supported(ht: int, wt: int, ci: int, oh: int, ow: int,
                         cm: int, c2: int, hoc: int,
                         itemsize: int = 2) -> bool:
    """Shape gate shared by the dispatcher and tests."""
    # ci % 128: the row-mix dot views t as [ht, wt*ci]; Mosaic's lane
    # merge needs the minor product dim to be a 128-multiple.
    if hoc != 1 or min(ht, wt) < 4 or ci % 128 or oh % 2 or ow % 2:
        return False
    return _pick_tile(ht, wt, ci, oh, ow, cm, c2, itemsize) > 0


# --------------------------------------------------------------------- v2
# Round-5 kernel (VERDICT r4 #1). v1's measured failure modes: the only
# VMEM-feasible tile was ty=8, whose per-tile dots ran at <10% MXU
# occupancy (row-mix M=10, H-mix K=8). v2 restructures:
#
# - CW layout in VMEM ([rows, C, width-in-lanes]): the phase-packed
#   blocking the XLA path needs to please layout assignment dissolves
#   inside a kernel — interleaved (block, phase) lanes ARE the full-
#   resolution width axis, so convs become lane-shifted dots.
# - Row-phase-packed conv dots: conv1 computes 2 output rows per dot
#   (M = 2*cm = 128), conv2 computes 4 (M = 4*c2 = 128); the 3x3 row taps
#   ride in K via zero-padded kernel slabs (K = 4*3*ci / 6*3*cm), so every
#   conv dot is [128, >=1152] x [>=1152, width] — full MXU shapes.
# - The dx taps are materialized per row-group as three lane-shifted
#   planes (two small VPU lane rotations per group), not 16 plane-sliced
#   dots (the r4 dead end).
# - Resize row/col halos and zero padding stay baked into the trace-time
#   matrices exactly as v1 (R1/R2 row plans, [0 | real | zeros] width
#   matrices).


@functools.lru_cache(maxsize=64)
def _tail_plan_v2(ht: int, oh: int, ty: int):
    """v1's ``_tail_plan`` with the v-window height rounded up to even so
    conv1's 2-row-phase groups tile it exactly."""
    hu = 2 * ht
    r1 = resize_matrix(ht, hu, "bilinear", True)
    r2 = resize_matrix(hu, oh, "bilinear", True)
    n = -(-oh // ty)
    tw = ty + 2
    v0s, v1s = [], []
    for i in range(n):
        rows = [r for r in range(i * ty - 1, i * ty + ty + 1) if 0 <= r < oh]
        taps = np.nonzero(r2[rows].any(axis=0))[0]
        v0s.append(int(taps.min()))
        v1s.append(int(taps.max()))
    tv = max(b - a + 1 for a, b in zip(v0s, v1s))
    tv += tv % 2
    v0s = [min(a, hu - tv) for a in v0s]
    tu = tv + 2
    R1 = np.zeros((n, tu, ht), np.float32)
    R2 = np.zeros((n, tw, tv), np.float32)
    for i in range(n):
        v0 = v0s[i]
        for k in range(tu):
            g = v0 - 1 + k
            if 0 <= g < hu:
                R1[i, k] = r1[g]
        for j in range(tw):
            g = i * ty - 1 + j
            if 0 <= g < oh:
                R2[i, j] = r2[g, v0 : v0 + tv]
    return tu, tv, R1, R2


def _vmem_estimate_v2(ht, wt, ci, cm, c2, tu, tv, tw, ty, ow, itemsize):
    """Liveness-aware estimate: the t slab + constants stay resident; the
    stage buffers are sequential, so the peak is the largest producer +
    consumer pair. Measured calibration (ty sweep, profile_tail_v2): Mosaic
    fuses the f32 dot epilogues — no whole-slab f32 temporaries exist."""
    wu = 2 * wt
    wup = _pad128(wu + 2)
    owp = _pad128(ow + 2)
    s = itemsize
    a = tu * wt * ci * s
    bp = tu * ci * wup * s
    v = tv * cm * wu * s
    xw = tv * cm * owp * s
    x = tw * cm * owp * s
    g1 = 12 * ci * wu * s + 2 * cm * wu * 4          # conv1 group bufs
    g2 = 18 * cm * owp * s + 4 * c2 * ow * 4         # conv2 group bufs
    consts = (
        tu * ht * 4 + tw * tv * 4 + wup * wt * 4 + owp * wu * 4
        + (2 * cm) * (12 * ci) * s + (4 * c2) * (18 * cm) * s
        + ty * ow * 4
    )
    stage_peak = max(a + bp, bp + v + g1, v + xw, xw + x, x + g2)
    return ht * wt * ci * s + consts + stage_peak


def _pick_tile_v2(ht, wt, ci, oh, ow, cm, c2, itemsize) -> int:
    """Row tile (multiple of 4 — conv2's 4-row phase groups; multiples of 8
    keep the output block legal). Among VMEM-feasible tiles, prefer the
    largest EXACT divisor of ``oh`` (no masked-tile waste; ty=56 measured
    fastest at 392 over the larger non-divisors), else the largest."""
    feasible = []
    for ty in range(64, 7, -8):
        tu, tv, _, _ = _tail_plan_v2(ht, oh, ty)
        if _vmem_estimate_v2(ht, wt, ci, cm, c2, tu, tv, ty + 2, ty, ow,
                             itemsize) <= _VMEM_BUDGET_V2:
            feasible.append(ty)
    for ty in feasible:
        if oh % ty == 0:
            return ty
    return feasible[0] if feasible else 0


def fused_tail_supported_v2(ht: int, wt: int, ci: int, oh: int, ow: int,
                            cm: int, c2: int, hoc: int,
                            itemsize: int = 2) -> bool:
    """Shape gate for the v2 kernel (same constraints as v1's gate; the
    tile picker enforces the VMEM ceiling)."""
    if hoc != 1 or min(ht, wt) < 4 or ci % 128 or oh % 2 or ow % 2:
        return False
    return _pick_tile_v2(ht, wt, ci, oh, ow, cm, c2, itemsize) > 0


def _pack_conv_rows(k: jnp.ndarray, phases: int, taps: int) -> jnp.ndarray:
    """[kh, kw, ci, co] -> [phases*co, taps*kw*ci] row-phase-packed slab:
    out[(ro, co), (dr, dx, ci)] = k[dr - ro, dx, ci, co] (zero outside)."""
    kh, kw, ci, co = k.shape
    rows = []
    for ro in range(phases):
        drs = []
        for dr in range(taps):
            if 0 <= dr - ro < kh:
                drs.append(jnp.transpose(k[dr - ro], (2, 0, 1)))  # [co,kw,ci]
            else:
                drs.append(jnp.zeros((co, kw, ci), k.dtype))
        rows.append(jnp.stack(drs, axis=1))  # [co, taps, kw, ci]
    out = jnp.stack(rows, axis=0)            # [phases, co, taps, kw, ci]
    return out.reshape(phases * co, taps * kw * ci)


def _tail_kernel_v2(t_ref, r1_ref, r1w_ref, r2_ref, r2w_ref, k1p_ref, b1_ref,
                    k2p_ref, b2_ref, wv_ref, bd_ref, o_ref, *, tv: int,
                    ty: int, trailing_relu: bool):
    cdt = t_ref.dtype
    t = t_ref[0]                        # [ht, wt, ci]
    ci = t.shape[-1]
    r1 = r1_ref[0].astype(cdt)          # [tu, ht]
    r1w = r1w_ref[...].astype(cdt)      # [wup, wt]
    r2 = r2_ref[0].astype(cdt)          # [tw, tv]
    r2w = r2w_ref[...].astype(cdt)      # [owp, wu]
    cm = b1_ref.shape[-1]
    c2 = b2_ref.shape[-1]
    wu = r2w.shape[1]
    ow = o_ref.shape[2]
    tw = r2.shape[0]
    owp = r2w.shape[0]

    # H-resize-1 rows for this tile (conv1 halo rows included via R1's
    # zero rows): [tu, wt, ci]
    a = jax.lax.dot_general(r1, t, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(cdt)
    # W-resize-1 into CW layout; r1w's [0 | wu | zeros] rows double as
    # conv1's zero width padding: [tu, ci, wup]
    bp = jax.lax.dot_general(a, r1w, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(cdt)

    # conv1: 2-row-phase groups, K = (4 rows x 3 dx x ci)
    k1p = k1p_ref[...].astype(cdt)      # [2*cm, 12*ci]
    b1 = b1_ref[0].astype(jnp.float32)
    vrows = []
    for g in range(tv // 2):
        u4 = bp[2 * g : 2 * g + 4]      # [4, ci, wup]
        u43 = jnp.stack([u4[:, :, dx : dx + wu] for dx in range(3)], axis=1)
        y = jax.lax.dot_general(
            k1p, u43.reshape(12 * ci, wu), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(2, cm, wu)
        vrows.append((y + b1[None, :, None]).astype(cdt))
    v = jnp.concatenate(vrows, axis=0)  # [tv, cm, wu]

    # W-resize-2 (r2w rows carry conv2's width zero-padding): [tv, cm, owp]
    xw = jax.lax.dot_general(v, r2w, (((2,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(cdt)
    # H-mix to this tile's tw = ty + 2 conv2 input rows (R2 zero rows =
    # conv2's row padding). owp is a 128-multiple so the 2-D view is legal.
    x = jax.lax.dot_general(
        r2, xw.reshape(tv, cm * owp), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt).reshape(tw, cm, owp)

    # conv2 + relu + dense(32->1): 4-row-phase groups, K = (6 x 3 x cm)
    k2p = k2p_ref[...].astype(cdt)      # [4*c2, 18*cm]
    b2 = b2_ref[0].astype(jnp.float32)
    wv = wv_ref[0].astype(jnp.float32)  # [c2]
    bd = bd_ref[0, 0]
    for g in range(ty // 4):
        x6 = x[4 * g : 4 * g + 6]       # [6, cm, owp]
        x63 = jnp.stack([x6[:, :, dx : dx + ow] for dx in range(3)], axis=1)
        z = jax.lax.dot_general(
            k2p, x63.reshape(18 * cm, ow), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(4, c2, ow)
        z = jnp.maximum(z + b2[None, :, None], 0.0)
        d = jnp.sum(z * wv[None, :, None], axis=1) + bd
        if trailing_relu:
            d = jnp.maximum(d, 0.0)
        o_ref[0, 4 * g : 4 * g + 4, :] = d.astype(o_ref.dtype)


def fused_dpt_tail_v2(
    t: jnp.ndarray,
    out_hw: tuple[int, int],
    k1: jnp.ndarray,
    b1: jnp.ndarray,
    k2: jnp.ndarray,
    b2: jnp.ndarray,
    kd: jnp.ndarray,
    bd: jnp.ndarray,
    *,
    trailing_relu: bool,
    interpret: bool | None = None,
    force_ty: int | None = None,
) -> jnp.ndarray:
    """v2 fused tail: same contract as ``fused_dpt_tail`` (see module
    docstring + the v2 design block above)."""
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, ht, wt, ci = t.shape
    oh, ow = out_hw
    cm = k1.shape[-1]
    c2 = k2.shape[-1]
    cdt = t.dtype
    itemsize = jnp.dtype(cdt).itemsize
    ty = force_ty or _pick_tile_v2(ht, wt, ci, oh, ow, cm, c2, itemsize)
    if not ty:
        raise ValueError(
            f"fused_dpt_tail_v2: no VMEM-feasible tile for {t.shape}->{out_hw}"
        )
    tu, tv, R1, R2 = _tail_plan_v2(ht, oh, ty)
    n = -(-oh // ty)
    tw = ty + 2
    wu = 2 * wt
    wup, owp = _pad128(wu + 2), _pad128(ow + 2)
    r1w = np.zeros((wup, wt), np.float32)
    r1w[1 : 1 + wu] = resize_matrix(wt, wu, "bilinear", True)
    r2w = np.zeros((owp, wu), np.float32)
    r2w[1 : 1 + ow] = resize_matrix(wu, ow, "bilinear", True)

    k1p = _pack_conv_rows(k1.astype(cdt), 2, 4)    # [2*cm, 12*ci]
    k2p = _pack_conv_rows(k2.astype(cdt), 4, 6)    # [4*c2, 18*cm]

    kernel = functools.partial(_tail_kernel_v2, tv=tv, ty=ty,
                               trailing_relu=trailing_relu)
    # Mosaic's scoped-vmem ceiling is context-dependent (the same ty=56
    # kernel compiles inside a scan body but trips the default 16 MB limit
    # as a standalone entry, measured v5e); pin the limit so tile choice is
    # deterministic. 20 MB clears the measured 18.85 MB standalone demand
    # at ty=56 while staying far under the 64 MB arch ceiling.
    params = None
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        params = pltpu.CompilerParams(vmem_limit_bytes=24 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, oh, ow), jnp.float32),
        grid=(b, n),
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((1, ht, wt, ci), lambda bi, i: (bi, 0, 0, 0)),
            pl.BlockSpec((1, tu, ht), lambda bi, i: (i, 0, 0)),
            pl.BlockSpec((wup, wt), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, tw, tv), lambda bi, i: (i, 0, 0)),
            pl.BlockSpec((owp, wu), lambda bi, i: (0, 0)),
            pl.BlockSpec((2 * cm, 12 * ci), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, cm), lambda bi, i: (0, 0)),
            pl.BlockSpec((4 * c2, 18 * cm), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, c2), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, c2), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, 1), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ty, ow), lambda bi, i: (bi, i, 0)),
        interpret=interpret,
    )(
        t,
        jnp.asarray(R1),
        jnp.asarray(r1w),
        jnp.asarray(R2),
        jnp.asarray(r2w),
        k1p,
        b1.reshape(1, cm),
        k2p,
        b2.reshape(1, c2),
        kd.reshape(1, c2),
        jnp.asarray(bd, jnp.float32).reshape(1, 1),
    )
    return out.astype(cdt)


def _tail_kernel(t_ref, r1_ref, r1w_ref, r2_ref, r2w_ref, k1_ref, b1_ref,
                 k2_ref, b2_ref, wv_ref, bd_ref, o_ref, *, tv: int, ty: int,
                 trailing_relu: bool):
    cdt = t_ref.dtype
    t = t_ref[0]                       # [ht, wt, ci]
    r1 = r1_ref[0].astype(cdt)         # [TU, ht]
    r1w = r1w_ref[...].astype(cdt)     # [wu, wt]
    r2 = r2_ref[0].astype(cdt)         # [TW, TV]
    r2w = r2w_ref[...].astype(cdt)     # [owp, wu] (zero-row padded, below)
    wu = 2 * t.shape[1]
    ow = o_ref.shape[2]

    # H-resize 1 (rows of u for this tile, incl. conv1 halo/zero rows)
    a = jax.lax.dot_general(
        r1, t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(cdt)                      # [TU, wt, ci]
    # W-resize 1 -> [TU, ci, wup]; r1w is zero-row padded
    # [0 | wu real rows | zeros] so columns 0..wu+1 of the product ARE the
    # zero-padded conv1 input row — no in-kernel pad pass.
    bp = jax.lax.dot_general(
        a, r1w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(cdt)                      # [TU, ci, wup]

    # conv1 (3x3, C -> C/2) as 9 shifted channel-contractions
    v = None
    for dy in range(3):
        for dx in range(3):
            part = jax.lax.dot_general(
                bp[dy : dy + tv, :, dx : dx + wu],
                k1_ref[dy, dx].astype(cdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                          # [TV, wu, cm]
            v = part if v is None else v + part
    v = (v + b1_ref[0].astype(jnp.float32)).astype(cdt)

    # W-resize 2 first (same 3-D-lhs mid-contraction family Mosaic lowers
    # fine). r2w is zero-row-padded to a 128-multiple of output columns so
    # the following H-mix can legally view [TV, cm, owp] as the 2-D
    # [TV, cm*owp] (lane merges need a 128-multiple minor dim; a direct
    # [TW, TV] x [TV, wu, cm] dot dies on the cm=64 lane merge).
    tv = v.shape[0]
    owp = r2w.shape[0]
    cm = v.shape[-1]
    xw = jax.lax.dot_general(
        v, r2w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(cdt)                      # [TV, cm, owp]
    x = jax.lax.dot_general(
        r2, xw.reshape(tv, cm * owp), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt).reshape(r2.shape[0], cm, owp)  # [TW, cm, owp]
    # owp holds [pad-left-1 | ow | zeros]: columns 0..ow+1 are exactly the
    # zero-padded conv2 input row, so no extra jnp.pad pass is needed.
    xp = x

    # conv2 (3x3, C/2 -> 32)
    z = None
    for dy in range(3):
        for dx in range(3):
            part = jax.lax.dot_general(
                xp[dy : dy + ty, :, dx : dx + ow],
                k2_ref[dy, dx].astype(cdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                          # [TY, ow, c2]
            z = part if z is None else z + part
    z = jax.nn.relu(z + b2_ref[0].astype(jnp.float32))

    # dense 32 -> 1 as a weighted channel sum
    d = jnp.sum(z * wv_ref[0].astype(jnp.float32), axis=-1) + bd_ref[0, 0]
    if trailing_relu:
        d = jax.nn.relu(d)
    o_ref[0] = d.astype(o_ref.dtype)


def fused_dpt_tail(
    t: jnp.ndarray,
    out_hw: tuple[int, int],
    k1: jnp.ndarray,
    b1: jnp.ndarray,
    k2: jnp.ndarray,
    b2: jnp.ndarray,
    kd: jnp.ndarray,
    bd: jnp.ndarray,
    *,
    trailing_relu: bool,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Run the fused tail. ``t``: [B, ht, wt, C]; returns [B, oh, ow].

    k1 [3,3,C,Cm], k2 [3,3,Cm,32], kd [32,1] with biases — the exact
    ``output_conv1`` / ``output_conv2_0`` / ``output_conv2_2`` params of
    models/dpt.DPTHead (same names, shapes, and init).
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    b, ht, wt, ci = t.shape
    oh, ow = out_hw
    cm = k1.shape[-1]
    c2 = k2.shape[-1]
    cdt = t.dtype
    itemsize = jnp.dtype(cdt).itemsize
    ty = _pick_tile(ht, wt, ci, oh, ow, cm, c2, itemsize)
    if not ty:
        raise ValueError(
            f"fused_dpt_tail: no VMEM-feasible tile for {t.shape}->{out_hw}"
            " (gate with fused_tail_supported first)")
    tu, tv, R1, R2 = _tail_plan(ht, oh, ty)
    n = -(-oh // ty)
    tw = ty + 2
    wu = 2 * wt
    # Width resize matrices, zero-ROW padded to [0 | real | zeros] with a
    # 128-multiple row count: the leading/trailing zero rows double as the
    # convs' zero width-padding, and the 128-multiple makes the kernel's
    # [TV, cm, owp] -> [TV, cm*owp] view a legal Mosaic shape cast.
    wup, owp = _pad128(wu + 2), _pad128(ow + 2)
    r1w = np.zeros((wup, wt), np.float32)
    r1w[1 : 1 + wu] = resize_matrix(wt, wu, "bilinear", True)
    r2w = np.zeros((owp, wu), np.float32)
    r2w[1 : 1 + ow] = resize_matrix(wu, ow, "bilinear", True)
    r1w, r2w = jnp.asarray(r1w), jnp.asarray(r2w)

    kernel = functools.partial(_tail_kernel, tv=tv, ty=ty,
                               trailing_relu=trailing_relu)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, oh, ow), jnp.float32),
        grid=(b, n),
        in_specs=[
            pl.BlockSpec((1, ht, wt, ci), lambda bi, i: (bi, 0, 0, 0)),
            pl.BlockSpec((1, tu, ht), lambda bi, i: (i, 0, 0)),
            pl.BlockSpec((wup, wt), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, tw, tv), lambda bi, i: (i, 0, 0)),
            pl.BlockSpec((owp, wu), lambda bi, i: (0, 0)),
            pl.BlockSpec((3, 3, ci, cm), lambda bi, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, cm), lambda bi, i: (0, 0)),
            pl.BlockSpec((3, 3, cm, c2), lambda bi, i: (0, 0, 0, 0)),
            pl.BlockSpec((1, c2), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, c2), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, 1), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ty, ow), lambda bi, i: (bi, i, 0)),
        interpret=interpret,
    )(
        t,
        jnp.asarray(R1),
        r1w,
        jnp.asarray(R2),
        r2w,
        k1.astype(cdt),
        b1.reshape(1, cm),
        k2.astype(cdt),
        b2.reshape(1, c2),
        kd.reshape(1, c2),
        jnp.asarray(bd, jnp.float32).reshape(1, 1),
    )
    return out.astype(cdt)
