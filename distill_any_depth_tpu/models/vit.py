"""DINOv2-style vision transformer, TPU-first.

A from-scratch JAX/flax reimplementation of the encoder family used by the
reference (its behavior is specified by
distillanydepth/depth_anything_v2/dinov2.py and
distillanydepth/modeling/backbones/vit/ViT_DINO.py — one parameterized module
here replaces the reference's three near-identical copies).

TPU-native design choices:

- **NHWC layout** end-to-end; the patch embedding is expressed as
  space-to-depth + one big matmul (guaranteed MXU tiling) rather than a
  strided conv.
- **Positional-embedding interpolation at trace time**: under jit the image
  shape is static, so the bicubic resampling of the 37x37 base grid
  (dinov2.py:179-210 semantics, including the +0.1 offset and
  scale-factor-driven coordinates) collapses to a constant-folded matmul.
- **Attention** behind a swappable op (einsum baseline / Pallas flash).
- Pure-functional: params is a flax pytree, no mutable state.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from distill_any_depth_tpu.configs import EncoderConfig
from distill_any_depth_tpu.ops.attention import multi_head_attention_packed
from distill_any_depth_tpu.ops.resize import resize_matrix

Dtype = Any

_POS_PRECISION = jax.lax.Precision.HIGHEST


def _dense(features: int, dtype: Dtype, quant: str, name: str) -> nn.Module:
    """nn.Dense, or its dynamic-W8A8 drop-in when ``quant`` is "int8"
    (XLA lowering) or "int8_pallas" (fused-quant kernel) — inference-only
    forwards; ops/quant.py. Same param names/shapes either way, so
    checkpoints load unchanged."""
    if quant in ("int8", "int8_pallas"):
        from distill_any_depth_tpu.ops.quant import QuantDense

        impl = "pallas" if quant == "int8_pallas" else "xla"
        return QuantDense(features, dtype=dtype, impl=impl, name=name)
    return nn.Dense(features, dtype=dtype, name=name)


class PatchEmbed(nn.Module):
    """14x14/s14 patch embedding as space-to-depth + matmul.

    Equivalent to the reference's Conv2d(3, D, 14, 14)
    (dinov2_layers/patch_embed.py:69-83) but keeps the FLOPs in one large
    MXU-friendly GEMM. Kernel layout: ``[ph*pw*C, D]`` with (ph, pw, c)
    ordering — see utils/torch_interop for the OIHW mapping.
    """

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x = x.reshape(b, gh, p, gw, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.02),
            (p * p * c, self.embed_dim),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
        y = (
            jnp.dot(x, kernel.astype(self.dtype), preferred_element_type=self.dtype)
            + bias.astype(self.dtype)
        )
        return y


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dtype: Dtype = jnp.float32
    # "auto": exact erf form (what torch nn.GELU() computes) for fp32 —
    # the bit-parity paths — and the tanh approximation under bf16 compute:
    # its error (max 5e-4 abs / 2e-4 rel at |x|>0.5, measured) is below bf16
    # quantization, while the erf lowering costs ~12x more VPU time on TPU
    # (227us vs 18us per ViT-B MLP activation at bs8/392^2 —
    # scripts/profile_hypotheses.py). "exact"/"tanh" force one form (tests
    # compare bf16-tanh against fp32-tanh like-for-like).
    gelu: str = "auto"
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _dense(self.hidden_dim, self.dtype, self.quant, "fc1")(x)
        approx = self.gelu == "tanh" or (
            self.gelu == "auto" and jnp.dtype(self.dtype) == jnp.bfloat16
        )
        x = nn.gelu(x, approximate=approx)
        x = _dense(self.out_dim, self.dtype, self.quant, "fc2")(x)
        return x


class SwiGLU(nn.Module):
    """Fused-packing SwiGLU FFN (w12 packed), matching
    dinov2_layers/swiglu_ffn.py:13-63 including the 2/3 * 4d hidden rounding
    to a multiple of 8."""

    dim: int
    mlp_ratio: float
    dtype: Dtype = jnp.float32
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.dim * self.mlp_ratio)
        hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
        x12 = _dense(2 * hidden, self.dtype, self.quant, "w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        x = nn.silu(x1) * x2
        return _dense(self.dim, self.dtype, self.quant, "w3")(x)


class Attention(nn.Module):
    num_heads: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    lora_rank: int = 0
    band: tuple[int, int] | None = None
    quant: str = "none"
    # Static count of real token rows when the encoder carries an 8-aligned
    # padded N (DinoViT); keys at or beyond it are masked in-kernel.
    n_valid: int | None = None
    # When set, ``x`` is the FLAT residual stream [B*N, C] (see DinoViT:
    # 2D GEMMs pick better TPU emitters than 3D batched dots); attention
    # re-materializes [B, N, *] only around the kernel call (bitcast-free,
    # the arrays are contiguous).
    flat_batch: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
        if self.flat_batch:
            m, c = x.shape
            b = self.flat_batch
            n = m // b
        else:
            b, n, c = x.shape
        h = self.num_heads
        d = c // h
        if self.lora_rank > 0:
            from distill_any_depth_tpu.models.adapters import LoRADense

            dense = lambda f, name: LoRADense(f, self.lora_rank, dtype=self.dtype, name=name)  # noqa: E731
        else:
            dense = lambda f, name: _dense(f, self.dtype, self.quant, name)  # noqa: E731
        qkv = dense(3 * c, "qkv")(x)
        if self.flat_batch:
            qkv = qkv.reshape(b, n, 3 * c)
        # torch packs columns as (q|k|v, head, head_dim) — same ordering
        # here, which is exactly the layout the packed flash path consumes
        # without any relayout (ops/attention.multi_head_attention_packed).
        out = multi_head_attention_packed(qkv, h, bias=bias,
                                          impl=self.attn_impl, band=self.band,
                                          n_valid=self.n_valid)
        if self.flat_batch:
            out = out.reshape(b * n, c)
        return dense(c, "proj")(out)


class Block(nn.Module):
    """Pre-norm transformer block with LayerScale
    (dinov2_layers/block.py:36-110; eval path, no drop-path)."""

    num_heads: int
    mlp_ratio: float
    ffn: str
    init_values: float | None
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    lora_rank: int = 0
    use_ssf: bool = False
    band: tuple[int, int] | None = None
    gelu: str = "auto"
    quant: str = "none"
    n_valid: int | None = None
    # Flat residual stream [B*N, C] (see Attention.flat_batch).
    flat_batch: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, bias: jnp.ndarray | None = None) -> jnp.ndarray:
        dim = x.shape[-1]

        def layer_scale(name: str, y: jnp.ndarray) -> jnp.ndarray:
            if self.init_values is None:
                return y
            gamma = self.param(
                name, nn.initializers.constant(self.init_values), (dim,), jnp.float32
            )
            return y * gamma.astype(self.dtype)

        def maybe_ssf(name: str, y: jnp.ndarray) -> jnp.ndarray:
            if not self.use_ssf:
                return y
            from distill_any_depth_tpu.models.adapters import ssf

            return ssf(self.dtype, name=name)(y)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = maybe_ssf("ssf_norm1", y)
        y = Attention(
            self.num_heads, self.dtype, self.attn_impl, self.lora_rank,
            band=self.band, quant=self.quant, n_valid=self.n_valid,
            flat_batch=self.flat_batch, name="attn"
        )(y, bias)
        y = maybe_ssf("ssf_attn", y)
        x = x + layer_scale("ls1_gamma", y)

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = maybe_ssf("ssf_norm2", y)
        if self.ffn == "swiglu":
            y = SwiGLU(dim, self.mlp_ratio, self.dtype, quant=self.quant,
                       name="mlp")(y)
        else:
            y = Mlp(int(dim * self.mlp_ratio), dim, self.dtype,
                    gelu=self.gelu, quant=self.quant, name="mlp")(y)
        y = maybe_ssf("ssf_mlp", y)
        x = x + layer_scale("ls2_gamma", y)
        return x


def _interp_pos_embed(
    pos_embed: jnp.ndarray,
    base_grid: int,
    gh: int,
    gw: int,
    offset: float,
    dtype: Dtype,
    has_cls: bool = True,
) -> jnp.ndarray:
    """Bicubic pos-embed resampling with torch scale-factor semantics.

    Reference computes ``interpolate(scale_factor=((g+off)/g0, ...),
    mode='bicubic')`` (dinov2.py:194-205; cls-less windowed variant
    ViT_DINO.py:1030-1058). Shapes are static under jit so the interpolation
    matrices are numpy constants.
    """
    n_base = base_grid * base_grid
    n_cls = 1 if has_cls else 0
    cls_pos = pos_embed[:, :n_cls]
    patch_pos = pos_embed[:, n_cls : n_cls + n_base]
    if (gh, gw) == (base_grid, base_grid):
        return pos_embed.astype(dtype)
    dim = pos_embed.shape[-1]
    grid = patch_pos.reshape(base_grid, base_grid, dim).astype(jnp.float32)
    sh = (gh + offset) / base_grid
    sw = (gw + offset) / base_grid
    mh = jnp.asarray(resize_matrix(base_grid, gh, "bicubic", False, sh))
    mw = jnp.asarray(resize_matrix(base_grid, gw, "bicubic", False, sw))
    out = jnp.einsum("Hh,hwc->Hwc", mh, grid, precision=_POS_PRECISION)
    out = jnp.einsum("Ww,hwc->hWc", mw, out, precision=_POS_PRECISION)
    out = out.reshape(1, gh * gw, dim)
    if not has_cls:
        return out.astype(dtype)
    return jnp.concatenate([cls_pos.astype(jnp.float32), out], axis=1).astype(dtype)


class PosConv(nn.Module):
    """PEG conv positional encoding (ViT_DINO.py:853-871, PosConv; the PEG
    of https://arxiv.org/abs/2102.10882).

    A 37x37 depthwise conv over the token grid plus the identity (stride 1).
    Input/output: ``[B, N, C]`` tokens on a ``gh x gw`` grid, NHWC inside.
    """

    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
        b, n, c = tokens.shape
        x = tokens.reshape(b, gh, gw, c)
        y = nn.Conv(
            self.embed_dim,
            (37, 37),
            padding=((18, 18), (18, 18)),
            feature_group_count=self.embed_dim,
            dtype=self.dtype,
            name="proj",
        )(x)
        y = y + x  # stride==1 residual (ViT_DINO.py:866-867)
        return y.reshape(b, n, c)


class DinoViT(nn.Module):
    """DINOv2 encoder with intermediate-layer taps.

    ``__call__`` returns ``(taps, cls_tokens)`` where ``taps`` is a list of
    ``[B, N_patches, C]`` (final-norm applied, cls/register tokens stripped)
    for each index in ``cfg.out_indices`` — the contract of
    ``get_intermediate_layers(..., return_class_token=True, norm=True)``
    (dinov2.py:297-321).
    """

    cfg: EncoderConfig
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    gelu: str = "auto"
    # "int8": inference-only dynamic-W8A8 GEMMs (2x MXU rate on v5e);
    # see ops/quant.py. Training paths must keep "none".
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, pe_step: jnp.ndarray | None = None):
        cfg = self.cfg
        b, h, w, _ = x.shape
        p = cfg.patch_size
        if h % p or w % p:
            raise ValueError(f"input {h}x{w} must be a multiple of patch {p}")
        gh, gw = h // p, w // p
        base_grid = cfg.base_img_size // p
        n_base = base_grid * base_grid

        tokens = PatchEmbed(p, cfg.embed_dim, self.dtype, name="patch_embed")(x)

        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, n_base + (1 if cfg.use_cls_token else 0), cfg.embed_dim),
            jnp.float32,
        )
        if cfg.use_cls_token:
            cls_token = self.param(
                "cls_token",
                nn.initializers.normal(stddev=1e-6),
                (1, 1, cfg.embed_dim),
                jnp.float32,
            )
            tokens = jnp.concatenate(
                [
                    jnp.broadcast_to(cls_token.astype(self.dtype), (b, 1, cfg.embed_dim)),
                    tokens,
                ],
                axis=1,
            )
        pe = _interp_pos_embed(
            pos_embed, base_grid, gh, gw, cfg.interpolate_offset, self.dtype,
            has_cls=cfg.use_cls_token,
        )
        if cfg.use_pos_conv:
            # PE -> GPE scheduled blend (ViT_DINO.py:1016-1019, 1118-1139):
            # coef ramps 0 -> 1 between pe_start_step and pe_total_step;
            # inference (pe_step=None) uses the post-schedule coef = 1
            # (current_step initialized past total_step, :1019).
            gpe = PosConv(cfg.embed_dim, self.dtype, name="pos_conv")(tokens, gh, gw)
            if pe_step is None:
                tokens = tokens + gpe
            else:
                coef = jnp.clip(
                    (jnp.asarray(pe_step, jnp.float32) - cfg.pe_start_step)
                    / (cfg.pe_total_step - cfg.pe_start_step),
                    0.0,
                    1.0,
                ).astype(self.dtype)
                tokens = tokens + (1.0 - coef) * pe + coef * gpe
        else:
            tokens = tokens + pe

        n_prefix = 1 if cfg.use_cls_token else 0
        if cfg.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.normal(stddev=1e-6),
                (1, cfg.num_register_tokens, cfg.embed_dim),
                jnp.float32,
            )
            reg = jnp.broadcast_to(
                reg.astype(self.dtype), (b, cfg.num_register_tokens, cfg.embed_dim)
            )
            # Registers go between cls and patch tokens (dinov2.py:221-229).
            tokens = jnp.concatenate(
                [tokens[:, :n_prefix], reg, tokens[:, n_prefix:]], axis=1
            )
            n_prefix += cfg.num_register_tokens

        # Carry an 8-aligned token count through the blocks: the attention
        # kernels tile kv rows in 8-row sublanes, and padding N per-block
        # (jnp.pad around every kernel call) copies the whole qkv tensor 24x
        # per ViT-L forward. Pad ONCE here instead; pad rows are masked as
        # keys in-kernel (Attention.n_valid) so real-token outputs are exact,
        # and their own rows (garbage, but finite) are sliced off at the
        # taps. Gradients stay exact: the loss only reads sliced taps, so
        # pad rows receive zero cotangents, and masked keys contribute
        # exactly zero to dk/dv. Windowed models (grid-shaped bias) keep
        # their native N.
        n_valid = None
        if cfg.window_size is None and tokens.shape[1] % 8:
            n_valid = tokens.shape[1]
            tokens = jnp.pad(
                tokens, ((0, 0), (0, -n_valid % 8), (0, 0))
            )

        # Flat residual stream: the block stack runs on [B*N, C] so every
        # GEMM is a 2D dot — the 3D batched dot+LN-stats fusions lower to
        # the EmitAllBatchInSublanes emitter (output M-tile of 99 rows),
        # measured 8.1% slower on the proj shape and 1.5% on fc2
        # (scripts/profile_flat_gemm.py, v5e). [B, N, *] re-materializes
        # only around the attention kernel (contiguous reshape, bitcast).
        # Windowed models keep 3D: their bias/PEG paths are grid-shaped.
        flat = cfg.window_size is None
        if flat:
            n_tok = tokens.shape[1]
            tokens = tokens.reshape(b * n_tok, cfg.embed_dim)

        block = Block
        if self.remat:
            block = nn.remat(Block, static_argnums=())

        bias = None
        band = None
        if cfg.window_size is not None:
            from distill_any_depth_tpu.ops.window import local_window_bias

            bias = local_window_bias(
                gh, gw, cfg.window_size, n_prefix=n_prefix
            ).astype(self.dtype)
            if n_prefix == 0:
                # Prefix-less row-major grid: the flash kernel can ride the
                # band structure and skip fully-masked kv rows.
                band = (gw, cfg.window_size)

        out_set = set(cfg.out_indices)
        raw_taps: dict[int, jnp.ndarray] = {}
        for i in range(cfg.depth):
            tokens = block(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                ffn=cfg.ffn,
                init_values=cfg.init_values,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                lora_rank=cfg.lora_rank,
                use_ssf=cfg.use_ssf,
                band=band,
                gelu=self.gelu,
                quant=self.quant,
                n_valid=n_valid,
                flat_batch=b if flat else None,
                name=f"blocks_{i}",
            )(tokens, bias)
            if i in out_set:
                raw_taps[i] = tokens

        def unflat(t):
            return t.reshape(b, -1, cfg.embed_dim) if flat else t

        norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")
        taps, cls_tokens = [], []
        if cfg.final_taps:
            # Windowed-variant contract (ViT_DINO.py:1253-1264): all four
            # "taps" are the same final post-norm token tensor.
            t = unflat(norm(tokens))
            taps = [t[:, n_prefix:n_valid]] * 4
            cls_tokens = [t[:, 0]] * 4
        else:
            for i in cfg.out_indices:
                # tap_norm=False: multi_output pre-norm taps
                # (ViT_DINO_reg.py:1030-1038). norm runs on the flat stream
                # (2D rows), the [B, N, C] view re-materializes here.
                t = unflat(norm(raw_taps[i]) if cfg.tap_norm else raw_taps[i])
                cls_tokens.append(t[:, 0])
                # n_valid slice drops the 8-alignment pad rows (no-op when
                # n_valid is None)
                taps.append(t[:, n_prefix:n_valid])
            if not cfg.tap_norm:
                norm(tokens)  # keep the final-norm params in the pytree
        return taps, cls_tokens
