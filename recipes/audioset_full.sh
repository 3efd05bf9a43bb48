#!/bin/bash
# Full AudioSet-2M recipe (reference: egs/audioset/run.sh:17-75 values via
# the audioset_full preset). Expects datafiles produced per README
# ("Prepare datafiles"): JSON {"data":[{"wav":...,"labels":"mid1,mid2"}]}.
# The 527-class vocabulary is bundled (psla_tpu/assets); override with --label-csv.
#
# Single host: run as-is. Pod slice: launch once per host with
# PSLA_TPU_MULTIHOST=1 (jax.distributed self-discovers the coordinator).
set -euo pipefail

DATA_DIR=${DATA_DIR:-data/audioset}

python -m psla_tpu.cli --preset audioset_full \
  --data-train "$DATA_DIR/whole_train_data.json" \
  --data-val   "$DATA_DIR/eval_data.json" \
  --exp-dir    exp/audioset-full-$(date +%m%d) \
  --dtype bfloat16 \
  "$@"
