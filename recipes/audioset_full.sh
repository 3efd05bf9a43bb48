#!/bin/bash
# Full AudioSet-2M recipe (reference: egs/audioset/run.sh:17-75 values via
# the audioset_full preset). Expects datafiles produced per README
# ("Prepare datafiles"): JSON {"data":[{"wav":...,"labels":"mid1,mid2"}]}
# and the 527-class class_labels_indices.csv.
#
# Single host: run as-is. Pod slice: launch once per host with
# PSLA_TPU_MULTIHOST=1 (jax.distributed self-discovers the coordinator).
set -euo pipefail

DATA_DIR=${DATA_DIR:-data/audioset}

python -m psla_tpu.cli --preset audioset_full \
  --data-train "$DATA_DIR/whole_train_data.json" \
  --data-val   "$DATA_DIR/eval_data.json" \
  --label-csv  "$DATA_DIR/class_labels_indices.csv" \
  --exp-dir    exp/audioset-full-$(date +%m%d) \
  --dtype bfloat16 \
  "$@"
