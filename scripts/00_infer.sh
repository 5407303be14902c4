#!/usr/bin/env bash
# Single-image inference preset (reference: scripts/00_infer.sh).
set -euo pipefail
CKPT=${CKPT:?set CKPT to a model .safetensors}
OUTPUT_DIR=${OUTPUT_DIR:-output/infer}
INPUT=${INPUT:-data/input}

python -m distill_any_depth_tpu.cli.infer \
  --arch_name "${ARCH:-depthanything-large}" --checkpoint "$CKPT" \
  --input "$INPUT" --output_dir "$OUTPUT_DIR" \
  --processing_res "${RES:-518}" "$@"
