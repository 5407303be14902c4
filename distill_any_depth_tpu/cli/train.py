"""Distillation training CLI.

Flag surface mirrors tools/train_distillation.py:40-84 (same names where the
concept carries over) but maps onto the typed TrainConfig; shell-script
presets become --preset names.
"""
from __future__ import annotations

import argparse
import logging


def argument_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train depth distillation on TPU.")
    p.add_argument("--dataset_dir", default="data/nyu")
    p.add_argument("--teacher_models", nargs="+", default=["depthanything-large"])
    p.add_argument("--teacher_checkpoints", nargs="+", default=[])
    p.add_argument("--student_arch", default="depthanything-base")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--num_iterations", type=int, default=0)
    p.add_argument("--image_size", type=int, default=392)
    p.add_argument("--normalization", default="hybrid",
                   choices=["global", "hybrid", "local", "none"])
    p.add_argument("--num_segments", type=int, default=4)
    p.add_argument("--lambda_sc", type=float, default=0.5)
    p.add_argument("--lambda_lg", type=float, default=0.5)
    p.add_argument("--lambda_feat", type=float, default=1.0)
    p.add_argument("--lambda_grad", type=float, default=0.2)
    p.add_argument("--use_hdn_loss", action="store_true")
    p.add_argument("--hdn_variant", default="dr", choices=["dr", "dp", "ds"])
    p.add_argument("--hdn_level", type=int, default=3)
    p.add_argument("--lambda_hdn", type=float, default=0.8)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--scheduler_type", default="cosine",
                   choices=["cosine", "step", "none"])
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--checkpoint_interval", type=int, default=1000)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--val_split", type=float, default=0.1)
    p.add_argument("--early_stopping", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel mesh size (batch sharded over ICI, "
                        "GSPMD gradient psum). One process drives all chips "
                        "— no per-GPU process launcher needed")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size (Megatron qkv/proj/mlp "
                        "kernel sharding on student and teachers); composes "
                        "with --dp as a (dp x tp) device mesh")
    p.add_argument("--teacher_dtype", default="bfloat16")
    p.add_argument("--teacher_quant", default="none", choices=["none", "int8", "int8_pallas"],
                   help="int8: dynamic-W8A8 teacher GEMMs via XLA (the fast one); "
                        "int8_pallas: fused-quant Pallas kernel — measured "
                        "SLOWER end-to-end (0.81x, kept as the documented "
                        "counter-example, docs/DESIGN.md)")
    p.add_argument("--data_mode", default="nyu", choices=["nyu", "images"],
                   help="'nyu' CSV pairs or 'images' unlabeled-folder "
                        "global/local-crop distillation")
    p.add_argument("--resume", default=None,
                   help="orbax train_state directory (or the run's "
                   "output_dir containing one) to resume from")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler device trace of early steps")
    p.add_argument("--visualize_interval", type=int, default=500)
    p.add_argument("--lora_rank", type=int, default=0,
                   help="LoRA rank on student attention qkv/proj (0 = off)")
    p.add_argument("--use_ssf", action="store_true",
                   help="SSF scale/shift adapters on the student")
    p.add_argument("--adapter_only", action="store_true",
                   help="freeze base weights, train only LoRA/SSF adapters")
    p.add_argument("--device_preprocess", action="store_true",
                   help="ship decoded uint8 NYU frames raw and run the "
                        "square resize + ImageNet normalize on device (MXU "
                        "matmul) instead of cv2-on-host per sample")
    p.add_argument("--debug", action="store_true")
    return p


def main(args=None) -> dict:
    from distill_any_depth_tpu.configs import (
        LossConfig,
        OptimizerConfig,
        TrainConfig,
        model_config,
    )
    from distill_any_depth_tpu.train.loop import train_images, train_nyu

    import dataclasses

    if args is None:
        args = argument_parser().parse_args()
    logging.basicConfig(level=logging.DEBUG if args.debug else logging.INFO)

    student_cfg = model_config(args.student_arch)
    if args.lora_rank or args.use_ssf:
        student_cfg = dataclasses.replace(
            student_cfg,
            encoder=dataclasses.replace(
                student_cfg.encoder,
                lora_rank=args.lora_rank,
                use_ssf=args.use_ssf,
            ),
        )

    total_steps = args.num_iterations or args.num_epochs * 1000
    cfg = TrainConfig(
        student=student_cfg,
        teachers=tuple(args.teacher_models),
        teacher_checkpoints=tuple(args.teacher_checkpoints),
        loss=LossConfig(
            normalization=args.normalization,
            num_segments=args.num_segments,
            lambda_sc=args.lambda_sc,
            lambda_lg=args.lambda_lg,
            lambda_feat=args.lambda_feat,
            lambda_grad=args.lambda_grad,
            use_hdn=args.use_hdn_loss,
            hdn_variant=args.hdn_variant,
            hdn_level=args.hdn_level,
            lambda_hdn=args.lambda_hdn,
        ),
        optimizer=OptimizerConfig(
            lr=args.lr,
            weight_decay=args.weight_decay,
            warmup_steps=args.warmup_steps,
            schedule=args.scheduler_type,
            total_steps=total_steps,
            max_grad_norm=args.max_grad_norm,
        ),
        batch_size=args.batch_size,
        image_size=args.image_size,
        num_epochs=args.num_epochs,
        num_iterations=args.num_iterations,
        seed=args.seed,
        dp=args.dp,
        tp=args.tp,
        val_split=args.val_split,
        checkpoint_interval=args.checkpoint_interval,
        log_interval=args.log_interval,
        visualize_interval=args.visualize_interval,
        early_stopping=args.early_stopping,
        output_dir=args.output_dir,
        dataset_dir=args.dataset_dir,
        teacher_dtype=args.teacher_dtype,
        teacher_quant=args.teacher_quant,
        adapter_only=args.adapter_only,
        device_preprocess=args.device_preprocess,
    )
    kwargs = {}
    if args.resume:
        kwargs["resume"] = args.resume
    if args.profile_dir:
        kwargs["profile_dir"] = args.profile_dir
    if args.data_mode == "images":
        return train_images(cfg, **kwargs)
    return train_nyu(cfg, **kwargs)


if __name__ == "__main__":
    main()
