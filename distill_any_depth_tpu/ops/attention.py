"""Multi-head attention ops for the ViT encoders.

Two interchangeable implementations behind one entry point:

- ``mha_reference``: plain einsum softmax attention. XLA fuses this well for
  moderate sequence lengths (a 392 image is only 785 tokens) and it is the
  numerics baseline for parity tests against the PyTorch reference
  (distillanydepth/depth_anything_v2/dinov2_layers/attention.py:29-81).
- ``mha_flash``: blockwise Pallas flash-attention kernel (kernels live in
  ``distill_any_depth_tpu.ops.flash_attention``) for long sequences / bf16,
  the TPU-native replacement for xformers ``memory_efficient_attention``.

Selection is by ``impl`` argument; ``"auto"`` picks flash on TPU when the
sequence is long enough to pay for it, else the einsum path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["multi_head_attention", "multi_head_attention_packed"]

# Below this token count the einsum path beats the kernel-launch overhead.
# With the multi-head-per-program tiling the kernel wins from ~512 tokens
# (measured 385 us vs 550 us einsum at N=785, B8 H12 D64 bf16 on v5e).
_FLASH_MIN_SEQ = 512


def mha_reference(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Softmax attention over ``[B, N, H, D]`` tensors, returns same layout.

    Matches the reference math: q is pre-scaled by ``D**-0.5``, softmax in
    fp32 regardless of input dtype (attention.py:49-61 computes in the input
    dtype; we upcast the softmax for TPU bf16 safety — fp32 inputs match
    exactly, bf16 inputs are strictly more accurate).
    """
    dtype = q.dtype
    d = q.shape[-1]
    scale = d ** -0.5
    # fp32 inputs run at HIGHEST precision: TPU default-precision matmuls
    # quantize fp32 operands to bf16 (~1e-2 logit error), which would break
    # this path's role as the parity baseline. bf16 inputs take the fast
    # single-pass path.
    prec = (
        jax.lax.Precision.DEFAULT
        if dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    logits = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k, precision=prec)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs, v, precision=prec)
    return out


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    impl: str = "auto",
    band: tuple[int, int] | None = None,
) -> jnp.ndarray:
    """Dispatch attention over ``[B, N, H, D]`` q/k/v. ``band``: see
    ``mha_flash`` — (gw, window) when ``bias`` is a local-window mask over a
    prefix-less row-major token grid (lets the kernel skip masked FLOPs)."""
    if impl not in ("auto", "flash", "reference"):
        raise ValueError(f"unknown attention impl {impl!r}")
    if impl == "flash" or (impl == "auto" and _use_flash(q)):
        from distill_any_depth_tpu.ops import flash_attention

        return flash_attention.mha_flash(q, k, v, bias, band=band)
    if bias is not None and bias.ndim == 2:
        bias = bias[None, None]  # [N,N] -> broadcast over (batch, heads)
    return mha_reference(q, k, v, bias)


def multi_head_attention_packed(
    qkv: jnp.ndarray,
    num_heads: int,
    bias: jnp.ndarray | None = None,
    impl: str = "auto",
    band: tuple[int, int] | None = None,
    n_valid: int | None = None,
) -> jnp.ndarray:
    """Attention on the fused-QKV GEMM output ``[B, N, 3*H*D]`` (torch
    (branch, head, dim) column packing), returning ``[B, N, H*D]``.

    The bias-free flash path consumes the packed tensor directly
    (ops/flash_attention.mha_flash_packed) — no [B,N,H,D] <-> [B*H,N,D]
    relayouts in the forward. Everything else unpacks and goes through
    ``multi_head_attention``.

    ``n_valid`` (static): rows at or beyond it are padding tokens (the
    encoder carries an 8-aligned N, models/vit.DinoViT) — the flash path
    masks those keys in-kernel; fallback paths slice them off, run on the
    real rows, and zero-pad the output back (exact either way: pad rows
    never influence real rows, and their own outputs are discarded).
    """
    if impl not in ("auto", "flash", "reference"):
        raise ValueError(f"unknown attention impl {impl!r}")
    b, n, c3 = qkv.shape
    d = c3 // 3 // num_heads
    if n_valid is not None and n_valid >= n:
        n_valid = None
    if (
        bias is None
        and band is None
        and impl in ("auto", "flash")
        and (impl == "flash" or n >= _FLASH_MIN_SEQ)
        and _on_tpu()
    ):
        from distill_any_depth_tpu.ops import flash_attention

        if flash_attention.packed_flash_eligible(
            b, c3 // 3, d, qkv.dtype.itemsize
        ):
            return flash_attention.mha_flash_packed(qkv, num_heads,
                                                    n_valid=n_valid)
    if n_valid is not None:
        out = multi_head_attention_packed(
            qkv[:, :n_valid], num_heads, bias, impl, band
        )
        return jnp.pad(out, ((0, 0), (0, n - n_valid), (0, 0)))
    qkv5 = qkv.reshape(b, n, 3, num_heads, d)
    out = multi_head_attention(
        qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2], bias, impl, band
    )
    return out.reshape(b, n, c3 // 3)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _use_flash(q: jnp.ndarray) -> bool:
    return q.shape[1] >= _FLASH_MIN_SEQ and _on_tpu()
