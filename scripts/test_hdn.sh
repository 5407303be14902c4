#!/usr/bin/env bash
# 20-iteration HDN-enabled smoke run (reference: scripts/test_hdn.sh; the
# PYTORCH_ENABLE_MPS_FALLBACK nanmedian workaround is obsolete here — masked
# order statistics run on-device).
set -euo pipefail
OUTPUT_DIR=${OUTPUT_DIR:-output/hdn_smoke}
DATASET_DIR=${DATASET_DIR:-data/nyu}

python -m distill_any_depth_tpu.cli.train \
  --dataset_dir "$DATASET_DIR" --output_dir "$OUTPUT_DIR" \
  --batch_size 2 --image_size 196 --num_iterations 20 \
  --use_hdn_loss --hdn_variant dr --hdn_level 3 \
  --checkpoint_interval 10 --log_interval 1 --val_split 0 "$@"
