#!/usr/bin/env bash
# Convert HF FLUX.1 + T5 + CLIP + VAE safetensors into a loongx_tpu pipeline dir.
set -euo pipefail
python -m loongx_tpu.cli.convert \
  --flux "${FLUX_PATH:?path to FLUX.1 safetensors dir}" \
  --t5 "${T5_PATH:?}" --clip "${CLIP_PATH:?}" --vae "${VAE_PATH:?}" \
  --out "${OUT:-checkpoints/flux-dev}"
