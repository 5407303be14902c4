#!/usr/bin/env bash
# Quick-start NYU distillation preset (reference: scripts/train_test.sh —
# 392^2, bs16, hybrid norm, HDN dr level 3, warmup + cosine).
set -euo pipefail
OUTPUT_DIR=${OUTPUT_DIR:-output/train_test}
DATASET_DIR=${DATASET_DIR:-data/nyu}
TEACHER_CKPT=${TEACHER_CKPT:?set TEACHER_CKPT to a teacher .safetensors}

python -m distill_any_depth_tpu.cli.train \
  --dataset_dir "$DATASET_DIR" \
  --output_dir "$OUTPUT_DIR" \
  --teacher_models depthanything-large \
  --teacher_checkpoints "$TEACHER_CKPT" \
  --student_arch depthanything-base \
  --batch_size 16 --image_size 392 \
  --lr 1e-4 --weight_decay 1e-5 --scheduler_type cosine --warmup_steps 500 \
  --normalization hybrid --num_segments 4 \
  --lambda_sc 0.5 --lambda_lg 0.5 --lambda_feat 1.0 --lambda_grad 0.2 \
  --use_hdn_loss --hdn_variant dr --hdn_level 3 --lambda_hdn 0.8 \
  --val_split 0.1 --checkpoint_interval 1000 --log_interval 50 "$@"
