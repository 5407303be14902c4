"""DPT reassemble/fusion decoder and the full depth models.

Re-designed for TPU from the behavior of the reference decoder
(distillanydepth/depth_anything_v2/dpt.py:71-225,
depth_anything_v2/util/blocks.py, modeling/archs/dam/dam.py:183-419):

- NHWC everywhere; 1x1 convs are ``nn.Dense`` (pure GEMM), 3x3 convs use
  explicit torch-style padding so stride-2 halving matches OIHW semantics.
- The k4/s4 and k2/s2 transposed convs become one matmul + depth-to-space
  (``PatchExpand``) — identical math when kernel == stride, but a single
  large MXU GEMM instead of XLA's conv-transpose lowering.
- All bilinear upsampling uses trace-time matrix resizes with
  ``align_corners=True`` (ops/resize), bit-matching torch.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from distill_any_depth_tpu.configs import ModelConfig
from distill_any_depth_tpu.models.vit import DinoViT
from distill_any_depth_tpu.ops.resize import resize_2d, resize_2d_packed

Dtype = Any


def _conv3x3(features: int, stride: int = 1, use_bias: bool = True, name: str | None = None,
             dtype: Dtype = jnp.float32) -> nn.Conv:
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class _DenseParams(nn.Module):
    """Parameter-compatible stand-in for ``nn.Dense`` (same names, shapes,
    and init) that RETURNS the (kernel, bias) values instead of applying
    them — used by the fused-tail branch, which hands the weights to the
    Pallas kernel rather than calling the layer."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class FusedConv3x3(nn.Module):
    """3x3/s1 conv evaluated as a phase-packed 4x4/s2 conv + depth-to-space.

    Identical parameters (HWIO ``kernel`` + ``bias``, same init) and identical
    math to ``nn.Conv(features, (3,3), padding=1)``: the 3x3 kernel is placed
    at the 4 even/odd output-phase offsets of a 4x4/stride-2 kernel, so each
    output block row computes all 4 phases as channels and a depth-to-space
    restores the layout. The contraction becomes [16*C_in -> 4*C_out] —
    MXU-shaped for the DPT tail convs whose C_out (32/64) would otherwise
    fill a quarter of the 128 output lanes. 1.42x the FLOPs but ~1.9x faster
    (392^2 64->32 bs8 bf16: 2.86 -> 1.48 ms;
    scripts/profile_conv_variants.py). Odd spatial sizes fall back to the
    plain conv.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    # With keep_phases the packed layout [B, H/2, W/2, 2, 2, C_out] is
    # returned so the caller can apply further per-pixel ops (relu, 1x1
    # Dense) before ``merge_phases`` — the depth-to-space relayout then
    # moves the (small) final channel count instead of C_out.
    keep_phases: bool = False
    # Set when calling with x=None (fused-tail branch): the module then
    # only declares its parameters and returns (kernel, bias) as f32.
    in_features: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray | None = None) -> jnp.ndarray:
        c_in = self.in_features if x is None else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c_in, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if x is None:
            return kernel, bias
        k = kernel.astype(self.dtype)
        co = self.features
        if x.ndim == 6:
            # HALO-padded space-to-depth input [B, bh, bw, 2, 2, C] from
            # ops/resize.resize_2d_packed ONLY: block (i, a) must hold
            # padded pixel 2i + a - 1 (zero outside the image). A *pure*
            # keep_phases tensor (block (i, a) = pixel 2i + a, e.g. this
            # module's own 6-D output) is NOT valid input here — same rank,
            # half-pixel-shifted meaning; route it through
            # resize_2d_packed(packed_input=True) or merge_phases first.
            # With the halo baked into the blocking, the 4x4/s2
            # phase-packed form collapses to a 2x2/s1 VALID conv over 4C
            # channels — pure aligned GEMMs, no [B, H, W, C] intermediate,
            # and bh - 1 output blocks with no crop.
            b, bh, bw, _, _, _ = x.shape
            kp = jnp.concatenate(
                [
                    jnp.pad(k, ((a, 1 - a), (p, 1 - p), (0, 0), (0, 0)))
                    for a in range(2)
                    for p in range(2)
                ],
                axis=-1,
            )
            k2 = kp.reshape(2, 2, 2, 2, c_in, 4 * co).transpose(0, 2, 1, 3, 4, 5)
            k2 = k2.reshape(2, 2, 4 * c_in, 4 * co)
            y = jax.lax.conv_general_dilated(
                x.reshape(b, bh, bw, 4 * c_in), k2, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y.reshape(b, bh - 1, bw - 1, 2, 2, co)
            if bias is not None:
                y = y + bias.astype(self.dtype)
            if not self.keep_phases:
                y = merge_phases(y)
            return y
        b, h, w, _ = x.shape
        # C_out >= 128 already fills the output lanes — the 1.42x extra FLOPs
        # would only slow it down there.
        if h % 2 or w % 2 or co >= 128:
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            # K'[a:a+3, p:p+3, :, (2a+p)*CO:+CO] = K for phases (a, p).
            kp = jnp.concatenate(
                [
                    jnp.pad(k, ((a, 1 - a), (p, 1 - p), (0, 0), (0, 0)))
                    for a in range(2)
                    for p in range(2)
                ],
                axis=-1,
            )
            y = jax.lax.conv_general_dilated(
                x, kp, (2, 2), ((1, 2), (1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y.reshape(b, h // 2, w // 2, 2, 2, co)
            if bias is not None:
                y = y + bias.astype(self.dtype)
            if not self.keep_phases:
                y = merge_phases(y)
            return y
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def merge_phases(y: jnp.ndarray) -> jnp.ndarray:
    """[B, H/2, W/2, 2, 2, C] phase-packed -> [B, H, W, C]; identity on
    already-merged [B, H, W, C] inputs (plain-conv fallback path)."""
    if y.ndim == 4:
        return y
    b, h2, w2, _, _, c = y.shape
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h2 * 2, w2 * 2, c)


class PatchExpand(nn.Module):
    """ConvTranspose2d(k=s) as matmul + depth-to-space.

    For kernel == stride the transposed conv places non-overlapping k x k
    blocks, i.e. ``y[ki+a, kj+b, o] = sum_c x[i,j,c] * W[c,o,a,b] + bias[o]``
    — exactly a Dense to ``k*k*O`` followed by pixel shuffle. Replaces
    dpt.py:94-106's ConvTranspose2d layers.
    """

    factor: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        f, o = self.factor, self.out_channels
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (c, f * f * o),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (o,), jnp.float32)
        y = jnp.dot(x, kernel.astype(self.dtype), preferred_element_type=self.dtype)
        y = y.reshape(b, h, w, f, f, o)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * f, w * f, o)
        return y + bias.astype(self.dtype)


class ResidualConvUnit(nn.Module):
    """relu -> conv3x3 -> relu -> conv3x3 -> +x (util/blocks.py:29-80)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.relu(x)
        y = _conv3x3(self.features, dtype=self.dtype, name="conv1")(y)
        y = nn.relu(y)
        y = _conv3x3(self.features, dtype=self.dtype, name="conv2")(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    """Refinenet fusion (util/blocks.py:83-148): optional skip through rcu1,
    rcu2, bilinear upsample (align_corners=True), 1x1 out conv.

    ``packed_output`` swaps the upsample/out_conv order — valid because a
    1x1 conv commutes with bilinear resampling (per-pixel linear map; the
    interpolation rows sum to 1, so the bias field is preserved) — and
    emits the halo-padded space-to-depth layout a following
    ``FusedConv3x3`` consumes directly. The out_conv GEMM then also runs at
    the pre-upsample resolution (4x fewer pixels).
    """

    features: int
    dtype: Dtype = jnp.float32
    packed_output: bool = False
    # Apply out_conv at the pre-upsample resolution and return WITHOUT the
    # resize (valid for the same commutation reason as packed_output) —
    # the fused-tail Pallas kernel folds the upsample into itself.
    defer_resize: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skip: jnp.ndarray | None = None,
        size: tuple[int, int] | None = None,
    ) -> jnp.ndarray:
        if skip is not None:
            x = x + ResidualConvUnit(self.features, self.dtype, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, self.dtype, name="rcu2")(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        if self.defer_resize:
            return nn.Dense(self.features, dtype=self.dtype, name="out_conv")(x)
        if self.packed_output and size[0] % 2 == 0 and size[1] % 2 == 0:
            x = nn.Dense(self.features, dtype=self.dtype, name="out_conv")(x)
            return resize_2d_packed(x, size, "bilinear", align_corners=True)
        x = resize_2d(x, size, "bilinear", align_corners=True)
        x = nn.Dense(self.features, dtype=self.dtype, name="out_conv")(x)
        return x


class DPTHead(nn.Module):
    """DPT decoder head (dpt.py:71-184 / dam.py:183-304 unified).

    Input: 4 token taps ``[B, N, C_embed]`` (+ optional cls tokens) and the
    patch grid ``(gh, gw)``. Output: ``[B, 14*gh, 14*gw, head_out_channels]``.
    """

    features: int
    out_channels: Sequence[int]
    head_out_channels: int = 1
    use_clstoken: bool = False
    trailing_relu: bool = True  # student head ends in ReLU; teacher does not
    patch_size: int = 14
    dtype: Dtype = jnp.float32
    # Run the whole post-refinenet1 tail (2x upsample, output_conv1, the
    # align_corners upsample to patch-grid res, output_conv2 + ReLU + 1x1)
    # as ONE Pallas kernel (ops/dpt_tail). FORWARD-ONLY: no VJP is defined,
    # so enable it only on gradient-free paths (inference, pseudo-labels,
    # stop-gradient teacher forwards). Parameter structure is identical to
    # the packed path; unsupported shapes fall back automatically.
    fused_tail: bool = False
    # Tail formulation: "packed" (phase-packed GEMMs, default) or "spatial"
    # (plain resize + NHWC convs) — measurement/verification knob; identical
    # math either way.
    tail_impl: str = "packed"

    @nn.compact
    def __call__(
        self,
        taps: Sequence[jnp.ndarray],
        gh: int,
        gw: int,
        cls_tokens: Sequence[jnp.ndarray] | None = None,
    ) -> jnp.ndarray:
        assert len(taps) == 4
        outs = []
        for i, t in enumerate(taps):
            b, n, c = t.shape
            if self.use_clstoken:
                cls = cls_tokens[i][:, None, :]
                t = jnp.concatenate([t, jnp.broadcast_to(cls, t.shape)], axis=-1)
                t = nn.Dense(c, dtype=self.dtype, name=f"readout_{i}")(t)
                # erf form for fp32 parity, tanh approx under bf16 (cheaper
                # on the VPU, error below bf16 quantization — see models/vit.Mlp).
                t = nn.gelu(t, approximate=jnp.dtype(self.dtype) == jnp.bfloat16)
            x = t.reshape(b, gh, gw, c)
            # 1x1 projection conv == Dense over the channel axis.
            x = nn.Dense(self.out_channels[i], dtype=self.dtype, name=f"projects_{i}")(x)
            if i == 0:
                x = PatchExpand(4, self.out_channels[0], self.dtype, name="resize_0")(x)
            elif i == 1:
                x = PatchExpand(2, self.out_channels[1], self.dtype, name="resize_1")(x)
            elif i == 3:
                x = _conv3x3(self.out_channels[3], stride=2, dtype=self.dtype, name="resize_3")(x)
            outs.append(x)

        rn = [
            _conv3x3(self.features, use_bias=False, dtype=self.dtype, name=f"scratch_{i + 1}_rn")(outs[i])
            for i in range(4)
        ]

        path = FeatureFusionBlock(self.features, self.dtype, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3]
        )
        path = FeatureFusionBlock(self.features, self.dtype, name="refinenet3")(
            path, rn[2], size=rn[1].shape[1:3]
        )
        path = FeatureFusionBlock(self.features, self.dtype, name="refinenet2")(
            path, rn[1], size=rn[0].shape[1:3]
        )
        # From refinenet1 on, everything is spatially a 3x3 conv, a 1x1
        # conv, a relu, or a bilinear upsample — all of which run in the
        # half-resolution space-to-depth blocking (ops/resize
        # .resize_2d_packed + FusedConv3x3's packed branch), so no
        # full-resolution [B, H, W, C] tensor is ever materialized and the
        # convs stay aligned GEMMs. Odd target sizes (impossible for
        # patch 14) fall back to the spatial path.
        oh, ow = gh * self.patch_size, gw * self.patch_size
        if self.fused_tail:
            from distill_any_depth_tpu.ops.dpt_tail import (
                fused_dpt_tail_v2 as fused_dpt_tail,
                fused_tail_supported_v2 as fused_tail_supported,
            )
            ht, wt = rn[0].shape[1], rn[0].shape[2]
            if fused_tail_supported(ht, wt, self.features, oh, ow,
                                    self.features // 2, 32,
                                    self.head_out_channels,
                                    jnp.dtype(self.dtype).itemsize):
                t = FeatureFusionBlock(self.features, self.dtype,
                                       defer_resize=True,
                                       name="refinenet1")(path, rn[0])
                k1, b1 = FusedConv3x3(self.features // 2, dtype=self.dtype,
                                      in_features=self.features,
                                      name="output_conv1")(None)
                k2, b2 = FusedConv3x3(32, dtype=self.dtype,
                                      in_features=self.features // 2,
                                      name="output_conv2_0")(None)
                kd, bd = _DenseParams(self.head_out_channels, 32,
                                      name="output_conv2_2")()
                x = fused_dpt_tail(t, (oh, ow), k1, b1, k2, b2, kd, bd,
                                   trailing_relu=self.trailing_relu)
                return x[..., None]
        # (refinenet1's own 2x upsample target is even by construction;
        # only the final patch-grid target can be odd, and never is for
        # patch 14)
        packed = oh % 2 == 0 and ow % 2 == 0 and self.tail_impl != "spatial"
        path = FeatureFusionBlock(self.features, self.dtype, packed_output=packed,
                                  name="refinenet1")(path, rn[0])

        x = FusedConv3x3(self.features // 2, dtype=self.dtype,
                         keep_phases=packed, name="output_conv1")(path)
        if packed:
            x = resize_2d_packed(x, (oh, ow), "bilinear", align_corners=True,
                                 packed_input=True)
        else:
            x = resize_2d(x, (oh, ow), "bilinear", align_corners=True)
        # Keep the tail in phase-packed layout through the per-pixel relu +
        # 1x1 conv so the final depth-to-space moves head_out_channels
        # (usually 1) instead of 32 channels.
        x = FusedConv3x3(32, dtype=self.dtype, keep_phases=True,
                         name="output_conv2_0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.head_out_channels, dtype=self.dtype, name="output_conv2_2")(x)
        x = merge_phases(x)
        if self.trailing_relu:
            x = nn.relu(x)
        return x


class DepthModel(nn.Module):
    """Full monocular depth model: DINOv2 encoder + DPT head.

    Covers both the student (DepthAnythingV2, dpt.py:187-225) and the teacher
    (DepthAnything/DAM, dam.py:307-419) through ``ModelConfig`` flags.
    Returns ``(depth, features)``:

    - ``depth``: ``[B, H, W]`` (head_out_channels==1 squeezed) or
      ``[B, H, W, C_out]``, ReLU'd like the reference
      (dpt.py:222 / dam.py:412-417).
    - ``features``: final tap tokens ``[B, N, C_embed]`` (= features[3][0]).
    """

    cfg: ModelConfig
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    remat: bool = False
    gelu: str = "auto"  # see models/vit.Mlp
    # "int8": dynamic-W8A8 encoder GEMMs, inference-only (ops/quant.py).
    quant: str = "none"
    # Fused Pallas DPT-head tail; forward-only (see DPTHead.fused_tail).
    fused_tail: bool = False
    # "packed" | "spatial" tail formulation (see DPTHead.tail_impl).
    tail_impl: str = "packed"

    @nn.compact
    def __call__(self, x: jnp.ndarray, pe_step: jnp.ndarray | None = None):
        h, w = x.shape[1], x.shape[2]
        p = self.cfg.encoder.patch_size
        gh, gw = h // p, w // p

        taps, cls_tokens = DinoViT(
            self.cfg.encoder,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            remat=self.remat,
            gelu=self.gelu,
            quant=self.quant,
            name="pretrained",
        )(x, pe_step=pe_step)

        depth = DPTHead(
            features=self.cfg.features,
            out_channels=tuple(self.cfg.out_channels),
            head_out_channels=self.cfg.head_out_channels,
            use_clstoken=self.cfg.use_clstoken,
            trailing_relu=self.cfg.trailing_head_relu,
            patch_size=p,
            dtype=self.dtype,
            fused_tail=self.fused_tail,
            tail_impl=self.tail_impl,
            name="depth_head",
        )(taps, gh, gw, cls_tokens)

        if self.cfg.interp_to_input and depth.shape[1:3] != (h, w):
            depth = resize_2d(depth, (h, w), "bilinear", align_corners=True)
        # Final ReLU: idempotent for the student head (already ReLU'd), the
        # actual activation for the teacher head (dam.py:414-417). With
        # wo_relu_1_2_channel, channels 0-1 stay signed and only channels 2+
        # are ReLU'd (dam.py:416-417).
        if self.cfg.wo_relu_1_2_channel:
            depth = jnp.concatenate(
                [depth[..., :2], nn.relu(depth[..., 2:])], axis=-1
            )
        else:
            depth = nn.relu(depth)
        if depth.shape[-1] == 1:
            depth = depth[..., 0]
        return depth, taps[3]
