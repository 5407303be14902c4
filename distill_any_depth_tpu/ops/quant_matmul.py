"""Pallas W8A8 GEMM with inline dynamic activation quantization.

Why a kernel: the v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate,
but quantizing activations as a separate XLA op costs one extra HBM
round-trip of the activation tensor plus an int8 relayout — measured, that
eats most of the 2x (full-model speedups of only 1.0-1.1x). Here the
activation tile is quantized **in VMEM** on its first visit:

- grid ``(M/bm, N/bn)``, n-minor: the x block index is unchanged while j
  sweeps, so Mosaic keeps the block resident and the quantized copy
  (``xq`` scratch, int8) + per-row scales are computed once per m-tile
  (``j == 0``) and reused for every n-tile;
- weights arrive pre-quantized (per-output-channel int8 + fp32 scales) —
  at rest they are half the HBM bytes of bf16, and the fp32->int8 weight
  prep is loop-invariant (XLA hoists it out of scan/step loops);
- epilogue dequant ``acc_i32 * row_scale * col_scale (+ bias)`` runs on
  the int32 accumulator in registers, cast once to the output dtype.

Numerics match ops/quant.int8_matmul (same symmetric per-row/per-col
scheme, round-half-to-even) — the kernel is a speed path, not a new
quantization scheme.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is importable on all platforms; guard for safety
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

__all__ = ["w8a8_matmul"]

_EPS = 1e-8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(x_ref, wq_ref, ws_ref, bias_ref, o_ref, xq_ref, xs_ref, *, out_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        # exactly ops/quant.quantize_rows (same /127.0 spelling: a *(1/127)
        # differs in the last ulp and flips round-to-even ties)
        s = jnp.maximum(amax, _EPS) / 127.0
        xq_ref[:] = jnp.round(xf / s).astype(jnp.int8)
        xs_ref[:] = s

    acc = jax.lax.dot_general(
        xq_ref[:],
        wq_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]
    if bias_ref is not None:
        out = out + bias_ref[:]
    o_ref[:] = out.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "bm", "bn", "interpret")
)
def _w8a8_2d(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    ws: jnp.ndarray,
    bias: jnp.ndarray | None,
    out_dtype: Any,
    bm: int,
    bn: int,
    interpret: bool,
) -> jnp.ndarray:
    m, k = x.shape
    _, n = wq.shape
    mp = _round_up(m, bm)
    np_ = _round_up(n, bn)
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
    if np_ != n:
        wq = jnp.pad(wq, ((0, 0), (0, np_ - n)))
        ws = jnp.pad(ws, (0, np_ - n))
        if bias is not None:
            bias = jnp.pad(bias, (0, np_ - n))

    grid = (mp // bm, np_ // bn)
    in_specs = [
        pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
        pl.BlockSpec((k, bn), lambda i, j: (0, j)),
        pl.BlockSpec((1, bn), lambda i, j: (0, j)),
    ]
    args = [x, wq, ws.reshape(1, np_).astype(jnp.float32)]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j)))
        args.append(bias.reshape(1, np_).astype(jnp.float32))
        kernel = functools.partial(_kernel, out_dtype=out_dtype)
    else:
        kernel = functools.partial(
            lambda x_ref, wq_ref, ws_ref, o_ref, xq_ref, xs_ref, out_dtype: _kernel(
                x_ref, wq_ref, ws_ref, None, o_ref, xq_ref, xs_ref,
                out_dtype=out_dtype,
            ),
            out_dtype=out_dtype,
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out[:m, :n]


def w8a8_matmul(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype: Any = jnp.bfloat16,
    bm: int = 256,
    bn: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``x @ w (+ bias)`` with dynamic per-row int8 activations and
    per-output-channel int8 weights, fused in one Pallas kernel.

    ``x``: ``[..., K]`` float; ``w``: ``[K, N]`` float (quantized here,
    loop-invariant across steps); returns ``[..., N]`` in ``out_dtype``.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    *lead, k = x.shape
    m = int(np.prod(lead)) if lead else 1
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    ws = jnp.maximum(amax, _EPS) / 127.0  # == ops/quant.quantize_cols
    wq = jnp.round(wf / ws[None, :]).astype(jnp.int8)
    bm = min(bm, _round_up(m, 32))
    bn = min(bn, _round_up(w.shape[1], 128))
    out = _w8a8_2d(
        x.reshape(m, k), wq, ws, bias, jnp.dtype(out_dtype), bm, bn, interpret
    )
    return out.reshape(*lead, w.shape[1])
