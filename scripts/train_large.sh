#!/usr/bin/env bash
# Optimized-parameter NYU training preset (reference: scripts/train_large.sh).
# Its 384px is off the patch-14 grid; the canonical bucket here is 392
# (= 14*28, same as the reference's own train_test preset).
set -euo pipefail
OUTPUT_DIR=${OUTPUT_DIR:-output/nyu_depth_training}
DATASET_DIR=${DATASET_DIR:-data/nyu}
TEACHER_CKPT=${TEACHER_CKPT:?set TEACHER_CKPT}

python -m distill_any_depth_tpu.cli.train \
  --dataset_dir "$DATASET_DIR" --output_dir "$OUTPUT_DIR" \
  --teacher_models depthanything-large --teacher_checkpoints "$TEACHER_CKPT" \
  --student_arch depthanything-base \
  --batch_size 8 --image_size 392 --num_epochs 30 \
  --lr 1e-4 --weight_decay 1e-5 --warmup_steps 500 \
  --lambda_sc 0.5 --lambda_lg 0.5 --lambda_feat 1.0 --lambda_grad 0.2 \
  --use_hdn_loss --lambda_hdn 0.8 \
  --scheduler_type cosine --max_grad_norm 1.0 \
  --val_split 0.1 --checkpoint_interval 1000 "$@"
