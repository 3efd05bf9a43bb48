#!/bin/bash
# FSD50K recipe (reference: egs/fsd50k/run.sh:17-62): bs 24, lr 5e-4,
# 40 epochs, target_length 3000, wa 21-40; label enhancement applied at
# p=mean. Prepare data first:
#   python -m psla_tpu.tools.prep_fsd --fsd-dir /path/to/FSD50K --out data/fsd50k
set -euo pipefail

DATA_DIR=${DATA_DIR:-data/fsd50k}

python -m psla_tpu.cli --preset fsd50k \
  --data-train "$DATA_DIR/fsd50k_tr_full_type1_2_mean.json" \
  --data-val   "$DATA_DIR/fsd50k_val_full.json" \
  --data-eval  "$DATA_DIR/fsd50k_eval_full.json" \
  --exp-dir    exp/fsd50k-$(date +%m%d) \
  --dtype bfloat16 \
  "$@"
