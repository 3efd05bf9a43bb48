#!/bin/bash
# Balanced-AudioSet (20K) recipe (reference: egs/audioset/run.sh balanced
# column, SURVEY.md §6.3): lr 1e-3, 60 epochs, wa 41-60, decay from epoch
# 35, no weighted sampling (the subset is already balanced).
set -euo pipefail

DATA_DIR=${DATA_DIR:-data/audioset}

python -m psla_tpu.cli --preset audioset_balanced \
  --data-train "$DATA_DIR/balanced_train_data.json" \
  --data-val   "$DATA_DIR/eval_data.json" \
  --exp-dir    exp/audioset-bal-$(date +%m%d) \
  --dtype bfloat16 \
  "$@"
