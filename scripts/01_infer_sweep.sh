#!/usr/bin/env bash
# Inference over a sweep of checkpoint steps for visual regression
# (reference: scripts/01_infer.sh / 02_infer.sh).
set -euo pipefail
CKPT_DIR=${CKPT_DIR:?directory with student_checkpoint_*.safetensors}
OUTPUT_DIR=${OUTPUT_DIR:-output/infer_sweep}
INPUT=${INPUT:-data/input}

for ckpt in "$CKPT_DIR"/student_checkpoint_*.safetensors; do
  step=$(basename "$ckpt" .safetensors | sed 's/.*_//')
  python -m distill_any_depth_tpu.cli.infer \
    --arch_name "${ARCH:-depthanything-base}" --checkpoint "$ckpt" \
    --input "$INPUT" --output_dir "$OUTPUT_DIR/step_$step" \
    --processing_res "${RES:-392}"
done
