#!/usr/bin/env bash
# Paper-configuration training run (the equivalent of the reference's
# scripts/train_kuai_all_feature.sh — whose values are already this
# framework's defaults, so only paths and the run name are needed).
set -euo pipefail

FEATURES=${FEATURES:-features/packed}    # from mgsv-extract-features
OUT=${OUT:-runs}
NAME=${NAME:-made-paper}

python -m mgsv_tpu.cli.train \
    --data.feature_root "${FEATURES}" \
    --data.train_csv dataset/MGSV-EC/train_data.csv \
    --data.val_csv dataset/MGSV-EC/val_data.csv \
    --train.output_dir "${OUT}" \
    --train.name "${NAME}" \
    --train.profile true
