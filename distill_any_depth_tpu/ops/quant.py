"""Dynamic W8A8 int8 matmul for inference-only forwards.

TPU-native rationale: the v5e MXU runs int8 x int8 -> int32 at twice the
bf16 FLOP rate (394 TOPS vs 197 TFLOP/s). Teacher forwards in the
distillation step and the pseudo-label/inference CLIs are inference-only
(no gradients), so their GEMMs can ride the int8 path:

- **weights**: symmetric per-output-channel int8
  (``scale_j = max_i |W_ij| / 127``), quantized on the fly from the fp32
  checkpoint params — no new checkpoint format, and under ``lax.scan`` /
  repeated steps XLA hoists the (tiny) weight-quant work out of the hot
  GEMMs.
- **activations**: symmetric per-row (per-token) int8, computed dynamically
  (one abs-max reduction per GEMM input).
- accumulation in int32, dequant ``acc * row_scale * col_scale`` in fp32,
  bias added in the compute dtype.

The reference has no quantized path (its teachers run fp32/autocast CUDA);
this is a beyond-parity TPU feature, opt-in via ``quant="int8"`` on the
model factory and ``--quant int8`` on the CLIs.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["quantize_rows", "quantize_cols", "int8_matmul", "QuantDense"]

_EPS = 1e-8


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization along the last axis.

    Returns ``(x_q int8, scale fp32)`` with ``x ~= x_q * scale``.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    xq = jnp.round(xf / scale).astype(jnp.int8)
    return xq, scale


def quantize_cols(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a ``[in, out]``
    weight matrix. Returns ``(w_q int8, scale fp32 [out])``."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax, _EPS) / 127.0
    wq = jnp.round(wf / scale[None, :]).astype(jnp.int8)
    return wq, scale


def int8_matmul(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype: Any = jnp.bfloat16,
) -> jnp.ndarray:
    """``x @ w`` over the last axis of x via dynamic W8A8.

    ``x``: ``[..., in]`` float; ``w``: ``[in, out]`` float (quantized here —
    loop-invariant weight quantization is hoisted by XLA).
    """
    xq, xs = quantize_rows(x)
    wq, ws = quantize_cols(w)
    acc = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * ws
    y = y.astype(out_dtype)
    if bias is not None:
        y = y + bias.astype(out_dtype)
    return y


class QuantDense(nn.Module):
    """Drop-in for ``nn.Dense`` running the GEMM as dynamic W8A8 int8.

    Declares the same params (``kernel`` [in, out], ``bias``) so fp32/bf16
    checkpoints load unchanged. ``impl``: "xla" (separate quant pass) or
    "pallas" (activation quant fused in VMEM, ops/quant_matmul.py).
    """

    features: int
    dtype: Any = jnp.bfloat16
    use_bias: bool = True
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if self.impl == "pallas":
            from distill_any_depth_tpu.ops.quant_matmul import w8a8_matmul

            b32 = None if bias is None else bias.astype(jnp.float32)
            return w8a8_matmul(x, kernel, b32, out_dtype=self.dtype)
        return int8_matmul(x, kernel, bias, out_dtype=self.dtype)
