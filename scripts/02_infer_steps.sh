#!/usr/bin/env bash
# Inference over an explicit list of checkpoint steps (reference:
# scripts/02_infer.sh; 01_infer_sweep.sh globs instead).
set -euo pipefail
CKPT_DIR=${CKPT_DIR:?directory with student_checkpoint_<step>.safetensors}
OUTPUT_DIR=${OUTPUT_DIR:-output/infer_steps}
INPUT=${INPUT:-data/input}
STEPS=${STEPS:-"1000 1500 2000 2500 3000 3500 4000 4500 4750"}

for step in $STEPS; do
  python -m distill_any_depth_tpu.cli.infer \
    --arch_name "${ARCH:-depthanything-base}" \
    --checkpoint "$CKPT_DIR/student_checkpoint_${step}.safetensors" \
    --input "$INPUT" --output_dir "$OUTPUT_DIR/$step" \
    --processing_res "${RES:-392}"
done
