#!/usr/bin/env bash
# Multi-teacher distillation preset
# (reference: scripts/train_multiteacher_distill.sh).
set -euo pipefail
OUTPUT_DIR=${OUTPUT_DIR:-output/multiteacher}
DATASET_DIR=${DATASET_DIR:-data/nyu}
TEACHER_CKPT_L=${TEACHER_CKPT_L:?large teacher .safetensors}
TEACHER_CKPT_B=${TEACHER_CKPT_B:?base teacher .safetensors}

python -m distill_any_depth_tpu.cli.train \
  --dataset_dir "$DATASET_DIR" --output_dir "$OUTPUT_DIR" \
  --teacher_models depthanything-large depthanything-base \
  --teacher_checkpoints "$TEACHER_CKPT_L" "$TEACHER_CKPT_B" \
  --batch_size 16 --image_size 392 \
  --use_hdn_loss --hdn_variant dr --hdn_level 3 \
  --scheduler_type cosine --warmup_steps 500 --val_split 0.1 "$@"
