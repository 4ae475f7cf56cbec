#!/usr/bin/env bash
# Train the L-Mind neural-editing LoRA (reference: train/script/train_seed_loongx.sh).
# One process drives the whole TPU mesh — no accelerate launcher needed.
set -euo pipefail
export XFL_CONFIG=${XFL_CONFIG:-configs/seed_512.yaml}
python -m loongx_tpu.cli.train "$@"
