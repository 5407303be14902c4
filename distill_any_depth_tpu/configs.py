"""Typed configuration system.

One dataclass-based config tree replaces the reference's 40+ argparse flags
plus shell-script presets (reference: tools/train_distillation.py:40-84,
scripts/*.sh). Presets are plain constructors so they stay greppable and
composable; the CLI layer (cli/) maps flags onto these dataclasses.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """DINOv2-style ViT encoder hyper-parameters.

    Mirrors the reference zoo (distillanydepth/depth_anything_v2/dinov2.py:
    339-415 and modeling/backbones/vit/ViT_DINO.py:1336-1431) as data.
    """

    name: str
    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 14
    base_img_size: int = 518
    mlp_ratio: float = 4.0
    ffn: str = "mlp"  # "mlp" | "swiglu"
    init_values: float | None = 1.0  # LayerScale init; None disables
    num_register_tokens: int = 0
    interpolate_offset: float = 0.1
    out_indices: tuple[int, int, int, int] = (2, 5, 8, 11)
    # Local-window attention (odd window width in patches; None = global).
    # Covers the reference's windowed high-resolution variant
    # (ViT_DINO.py:875-1234) as an additive attention bias.
    window_size: int | None = None
    # Windowed-variant machinery (DinoWindowVisionTransformer,
    # ViT_DINO.py:875-1264): no cls token, conv positional encoding
    # (PosConv/PEG, :853-871) blended with the interpolated PE on a step
    # schedule (:1016-1019, :1118-1139), and all four taps equal to the
    # final post-norm layer (:1259-1264).
    use_cls_token: bool = True
    use_pos_conv: bool = False
    pe_start_step: int = 2000  # ViT_DINO.py:1017-1018 (start_step)
    pe_total_step: int = 10000  # ViT_DINO.py:1016 (total_step)
    final_taps: bool = False
    # multi_output taps (ViT_DINO_reg.py:1030-1038): evenly spaced taps
    # returned PRE-norm. tap_norm=False reproduces that (out_indices must
    # then be the evenly spaced quarter indices).
    tap_norm: bool = True
    # Parameter-efficient tuning (ViT_DINO_reg.py:29-133): LoRA rank on
    # attention qkv/proj (0 = off) and SSF scale/shift adapters.
    lora_rank: int = 0
    use_ssf: bool = False

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def _enc(name, dim, depth, heads, idx, **kw) -> EncoderConfig:
    return EncoderConfig(
        name=name, embed_dim=dim, depth=depth, num_heads=heads, out_indices=idx, **kw
    )


# Intermediate-layer taps follow the reference
# (distillanydepth/depth_anything_v2/dpt.py:198-203).
ENCODERS: dict[str, EncoderConfig] = {
    "vits": _enc("vits", 384, 12, 6, (2, 5, 8, 11)),
    "vitb": _enc("vitb", 768, 12, 12, (2, 5, 8, 11)),
    "vitl": _enc("vitl", 1024, 24, 16, (4, 11, 17, 23)),
    "vitg": _enc("vitg", 1536, 40, 24, (9, 19, 29, 39), ffn="swiglu"),
    # DINOv2-with-registers teacher variants
    # (modeling/backbones/vit/ViT_DINO_reg.py:1221-1294).
    # ViT_DINO_reg keeps the default interpolate_offset=0.1
    # (ViT_DINO_reg.py:777, :919; vit_large_reg/vit_giant2_reg don't override).
    "vitl_reg": _enc(
        "vitl_reg", 1024, 24, 16, (4, 11, 17, 23),
        num_register_tokens=4, init_values=1e-5,
    ),
    # vit_giant2_reg is built with multi_output=True (ViT_DINO_reg.py:1275-
    # 1294): evenly spaced pre-norm taps after every depth/4 blocks.
    "vitg_reg": _enc(
        "vitg_reg", 1536, 40, 24, (9, 19, 29, 39),
        num_register_tokens=4, init_values=1e-5,
        ffn="swiglu", tap_norm=False,
    ),
    # The windowed high-resolution ViT-B (DinoWindowVisionTransformer,
    # ViT_DINO.py:875-1264, instantiated by vit_base :1349-1360): window 7,
    # PEG conv positional encoding, no cls token, 224-based pos-embed grid,
    # four identical final-layer taps.
    "vitb_window": _enc(
        "vitb_window", 768, 12, 12, (2, 5, 8, 11),
        window_size=7, use_pos_conv=True, use_cls_token=False,
        base_img_size=224, init_values=1e-5, final_taps=True,
    ),
}


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full depth model = encoder + DPT head.

    ``trailing_head_relu`` distinguishes the student head (ReLU inside the
    output conv stack, depth_anything_v2/dpt.py:142-148) from the teacher head
    (no trailing ReLU, relu applied after full-res interpolation,
    modeling/archs/dam/dam.py:260-266, :412-417).
    """

    arch_name: str
    encoder: EncoderConfig
    features: int
    out_channels: tuple[int, int, int, int]
    head_out_channels: int = 1
    use_clstoken: bool = False
    trailing_head_relu: bool = True
    interp_to_input: bool = False  # teacher resizes depth to input resolution
    # Channel-selective trailing relu for multi-channel teacher heads
    # (dam.py:414-417): channels 0-1 pass through signed, channels 2+ relu'd.
    wo_relu_1_2_channel: bool = False


# Matches the reference model_kwargs tables
# (tools/testers/infer.py:66-84, tools/train_distillation.py:711-815) plus a
# vits preset used by the DA-V2 zoo.
MODELS: dict[str, ModelConfig] = {
    "depthanything-small": ModelConfig(
        "depthanything-small", ENCODERS["vits"], 64, (48, 96, 192, 384)
    ),
    "depthanything-base": ModelConfig(
        "depthanything-base", ENCODERS["vitb"], 128, (96, 192, 384, 768)
    ),
    "depthanything-large": ModelConfig(
        "depthanything-large",
        dataclasses.replace(ENCODERS["vitl"], init_values=1e-5),
        256,
        (256, 512, 1024, 1024),
        trailing_head_relu=False,
        interp_to_input=True,
    ),
    "depthanything-giant": ModelConfig(
        "depthanything-giant", ENCODERS["vitg"], 384, (1536, 1536, 1536, 1536)
    ),
    # DINOv2-with-registers teacher family, selected by use_registers in the
    # reference (dam.py:344-349: vitl -> vit_large_reg, vitg ->
    # vit_giant2_reg); DPT head dims follow the dam kwargs of the matching
    # non-reg arch (tools/train_distillation.py:713-729).
    "depthanything-large-reg": ModelConfig(
        "depthanything-large-reg",
        ENCODERS["vitl_reg"],
        256,
        (256, 512, 1024, 1024),
        trailing_head_relu=False,
        interp_to_input=True,
    ),
    "depthanything-giant-reg": ModelConfig(
        "depthanything-giant-reg",
        ENCODERS["vitg_reg"],
        384,
        (1536, 1536, 1536, 1536),
        trailing_head_relu=False,
        interp_to_input=True,
    ),
    # Windowed high-resolution ViT-B teacher (dam.py:361-362 encoder='vitb'
    # -> ViT_DINO.vit_base, the DinoWindowVisionTransformer).
    "depthanything-base-window": ModelConfig(
        "depthanything-base-window",
        ENCODERS["vitb_window"],
        128,
        (96, 192, 384, 768),
        trailing_head_relu=False,
        interp_to_input=True,
    ),
}


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Distillation loss stack weights and options.

    Defaults match the reference (README.md:76-100, scripts/train_test.sh).
    """

    normalization: str = "hybrid"  # global | hybrid | local | none
    num_segments: int = 4
    lambda_sc: float = 0.5
    lambda_lg: float = 0.5
    lambda_feat: float = 1.0
    lambda_grad: float = 0.2
    use_hdn: bool = True
    hdn_variant: str = "dr"  # dr | dp | ds
    hdn_level: int = 3
    lambda_hdn: float = 0.8


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Adam + linear warmup + cosine/step decay
    (reference: tools/train_distillation.py:1310-1350)."""

    lr: float = 1e-4
    weight_decay: float = 1e-5
    warmup_steps: int = 0
    schedule: str = "cosine"  # cosine | step | none
    total_steps: int = 10_000
    step_size: int = 10_000
    gamma: float = 0.1
    eta_min_ratio: float = 0.01
    max_grad_norm: float = 1.0
    # skip (not apply) updates when gradients contain NaN/inf
    skip_nonfinite_updates: bool = True


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    student: ModelConfig = MODELS["depthanything-base"]
    teachers: tuple[str, ...] = ("depthanything-large",)
    teacher_checkpoints: tuple[str, ...] = ()
    loss: LossConfig = LossConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    batch_size: int = 16
    image_size: int = 392
    num_epochs: int = 50
    num_iterations: int = 0
    seed: int = 42
    val_split: float = 0.1
    checkpoint_interval: int = 1000
    log_interval: int = 100
    visualize_interval: int = 500
    early_stopping: int = 0
    output_dir: str = "output"
    dataset_dir: str = "data/nyu"
    use_nyu_dataset: bool = True
    # parallelism: a 2-D (data, model) mesh over ICI. dp shards the batch
    # (GSPMD gradient psum); tp shards the ViT qkv/proj/mlp kernels
    # Megatron-style (parallel/tp.py) on students AND teachers.
    dp: int = 1  # data-parallel mesh size over ICI
    tp: int = 1  # tensor-parallel (model axis) mesh size
    teacher_dtype: str = "bfloat16"
    # "int8": teacher forwards run dynamic-W8A8 encoder GEMMs (2x MXU rate
    # on v5e; ops/quant.py). Teachers are inference-only inside the step
    # (stop_gradient), so this trades a bounded pseudo-label perturbation
    # for a faster step. Students always train unquantized.
    teacher_quant: str = "none"
    # fused Pallas DPT-head tail on teacher forwards (ops/dpt_tail v2) —
    # valid because teachers sit under stop_gradient (the kernel is
    # forward-only). "auto" (default): on for TPU backends, off elsewhere;
    # "on"/"off" force it. Measured v5e 392^2: full ViT-B fwd 13.50 vs
    # 14.73 ms packed (bs8), 27.23 vs 31.75 (bs16).
    teacher_fused_tail: str = "auto"
    # run teacher forwards as sequential lax.map chunks of this batch size
    # (0 = off). bs16's full-res DPT-tail intermediates thrash HBM; 2x bs8
    # chunks measured 95.8 -> 86.3 ms (r4) / 98.2 -> 95.0 ms (r5) on the
    # ViT-L 392^2 teacher (v5e, scripts/profile_{teacher_chunk,chunk_mesh}.py).
    # Single-device only — under a dp mesh it is a measured wash (the dp=2
    # per-device view bs8 -> 2 x bs4: 42.6 vs 42.8 ms), so the step ignores
    # it there rather than pay lax.map's serialization risk.
    teacher_chunk: int = 8
    # bf16 student matmuls by default: the loss stack upcasts to fp32
    # (train/step.py), params/optimizer stay fp32; ~1.5x faster steps on
    # v5e with trajectory parity validated in tests/test_train_parity.py.
    # Set "float32" for bit-level parity work.
    student_compute_dtype: str = "bfloat16"
    # host IO: prefer the C++ threaded loader (native/dad_loader.cpp) when
    # buildable; falls back to the Python loader otherwise
    use_native_loader: bool = True
    # ship decoded uint8 to the device and run the square resize (MXU
    # matmul) + /255 + ImageNet normalize inside the jitted step instead of
    # cv2-on-host per sample (the reference resizes on the host,
    # tools/data_loaders.py:90-120). Uses the Python loader (the native
    # loader's C++ resize is its own host-overlap strategy).
    device_preprocess: bool = False
    # rematerialize student blocks in the backward pass (trade FLOPs for
    # HBM — enables larger batches / resolutions)
    student_remat: bool = False
    attn_impl: str = "auto"  # auto | reference | flash
    # parameter-efficient fine-tuning: train only LoRA/SSF adapter params
    # (requires the student encoder config to enable lora_rank/use_ssf)
    adapter_only: bool = False


def model_config(arch_name: str) -> ModelConfig:
    if arch_name not in MODELS:
        raise KeyError(f"unknown arch {arch_name!r}; have {sorted(MODELS)}")
    return MODELS[arch_name]
