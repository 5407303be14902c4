#!/usr/bin/env bash
# Full 100-epoch production training preset (reference: scripts/train_full.sh;
# note its --gradient_clip flag never existed in the parser — here the real
# flag is --max_grad_norm).
set -euo pipefail
OUTPUT_DIR=${OUTPUT_DIR:-output/full}
DATASET_DIR=${DATASET_DIR:-data/nyu}
TEACHER_CKPT=${TEACHER_CKPT:?set TEACHER_CKPT}

python -m distill_any_depth_tpu.cli.train \
  --dataset_dir "$DATASET_DIR" --output_dir "$OUTPUT_DIR" \
  --teacher_models depthanything-large --teacher_checkpoints "$TEACHER_CKPT" \
  --batch_size 16 --image_size 392 --num_epochs 100 \
  --use_hdn_loss --hdn_variant dr --hdn_level 3 \
  --scheduler_type cosine --warmup_steps 1000 --max_grad_norm 1.0 \
  --val_split 0.1 --early_stopping 10 --checkpoint_interval 1000 "$@"
