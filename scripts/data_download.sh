#!/usr/bin/env bash
# Dataset downloads for training (reference train/script/data_download/
# data_download1.sh + data_download2.sh).  Requires `huggingface-cli`
# (pip install -U "huggingface_hub[cli]") and network access.
#
#   Subjects200K           -> SubjectPairDataset (configs/subject_512.yaml)
#   text-to-image-2M 512   -> ImageConditionDataset (canny/sr/fill/... configs)
#   text-to-image-2M 1024  -> ImageConditionDataset at 1024 (fill_1024.yaml)
#
# The L-Mind SEED dataset (jsonl + data_final.pkl biosignals) is released
# separately by the reference authors and is not on the HF hub.
set -euo pipefail

huggingface-cli download --repo-type dataset Yuanshi/Subjects200K
huggingface-cli download --repo-type dataset jackyhate/text-to-image-2M data_512_2M/data_000045.tar
huggingface-cli download --repo-type dataset jackyhate/text-to-image-2M data_512_2M/data_000046.tar
huggingface-cli download --repo-type dataset jackyhate/text-to-image-2M data_1024_10K/data_000000.tar
