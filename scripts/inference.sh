#!/usr/bin/env bash
# Batch neural-driven editing (reference: inference.sh). Batch is sharded
# across all visible TPU chips automatically — no --num_gpus spawn loop.
set -euo pipefail
export XFL_CONFIG=${XFL_CONFIG:-configs/seed_512.yaml}
python -m loongx_tpu.cli.infer \
  --checkpoint "${CHECKPOINT:?set CHECKPOINT=<converted pipeline dir>}" \
  --input_dir "${INPUT_DIR:?set INPUT_DIR}" \
  --output_dir "${OUTPUT_DIR:-outputs}" \
  --caption_path "${CAPTION_PATH:-}" \
  --brain_data_path "${BRAIN_DATA:-}" \
  "$@"
