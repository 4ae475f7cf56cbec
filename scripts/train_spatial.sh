#!/usr/bin/env bash
# Train a spatial-control LoRA (canny / sr / fill / subject / cartoon).
# Usage: CONFIG=configs/canny_512.yaml scripts/train_spatial.sh
set -euo pipefail
export XFL_CONFIG=${CONFIG:-configs/canny_512.yaml}
python -m loongx_tpu.cli.train "$@"
