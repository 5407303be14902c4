#!/usr/bin/env bash
# 10-iteration smoke training run (reference: scripts/test_training.sh).
set -euo pipefail
OUTPUT_DIR=${OUTPUT_DIR:-output/smoke}
DATASET_DIR=${DATASET_DIR:-data/smoke}

python -m distill_any_depth_tpu.cli.train \
  --dataset_dir "$DATASET_DIR" --output_dir "$OUTPUT_DIR" \
  --batch_size 2 --image_size 196 --num_iterations 10 \
  --checkpoint_interval 5 --log_interval 1 --val_split 0 --debug "$@"
