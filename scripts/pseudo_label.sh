#!/usr/bin/env bash
# Teacher pseudo-label batch inference at 518^2 (capability config 2).
set -euo pipefail
CKPT=${CKPT:?set CKPT to the teacher .safetensors}
INPUT=${INPUT:?image folder}
OUTPUT_DIR=${OUTPUT_DIR:-output/pseudo_labels}

python -m distill_any_depth_tpu.cli.pseudo_label \
  --arch_name depthanything-large --checkpoint "$CKPT" \
  --input "$INPUT" --output_dir "$OUTPUT_DIR" \
  --processing_res 518 --batch_size 8 --save_png16 "$@"
