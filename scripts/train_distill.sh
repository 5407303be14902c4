#!/usr/bin/env bash
# Paper-style distillation on an unlabeled image folder (reference:
# scripts/train_distill.sh — SA-1B-subset recipe: bs4, 20k iterations,
# lr 5e-5, 560px global crop (= 14*40), hybrid normalization, the
# reference's lambda_grad=2.0 quirk kept).
set -euo pipefail
DATASET_DIR=${DATASET_DIR:?set DATASET_DIR to an image folder (e.g. SA-1B subset)}
OUTPUT_DIR=${OUTPUT_DIR:-output/distilled_model}
TEACHER_CKPT=${TEACHER_CKPT:?set TEACHER_CKPT}

python -m distill_any_depth_tpu.cli.train \
  --data_mode images \
  --dataset_dir "$DATASET_DIR" --output_dir "$OUTPUT_DIR" \
  --teacher_models depthanything-large --teacher_checkpoints "$TEACHER_CKPT" \
  --student_arch depthanything-base \
  --batch_size 4 --num_iterations 20000 --lr 5e-5 \
  --image_size 560 \
  --normalization hybrid --num_segments 4 \
  --lambda_lg 0.5 --lambda_feat 1.0 --lambda_grad 2.0 \
  --seed 42 --checkpoint_interval 5000 --log_interval 100 "$@"
