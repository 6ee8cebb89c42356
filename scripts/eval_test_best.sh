#!/usr/bin/env bash
# Best-checkpoint sweep on the test split (the equivalent of the reference's
# scripts/test_kuai_all_feature.sh with --test_best, test-MaDe.py:491-501).
set -euo pipefail

FEATURES=${FEATURES:-features/packed}
RUN_DIR=${RUN_DIR:-runs/made-paper}

python -m mgsv_tpu.cli.evaluate \
    --run-dir "${RUN_DIR}" --test-best --split test \
    --data.feature_root "${FEATURES}" \
    --data.test_csv dataset/MGSV-EC/test_data.csv \
    --save-json "${RUN_DIR}/test_results.json"
