#!/usr/bin/env bash
# Quality evaluation over generated vs ground-truth pairs (reference: test.sh).
set -euo pipefail
python -m loongx_tpu.cli.evaluate \
  --gen_dir "${GEN_DIR:?set GEN_DIR}" \
  --gt_dir "${GT_DIR:-$GEN_DIR}" \
  --clip_path "${CLIP_PATH:-}" \
  --dino_path "${DINO_PATH:-}" \
  --out_dir "${OUT_DIR:-eval_results}" \
  "$@"
