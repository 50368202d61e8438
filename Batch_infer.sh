#!/usr/bin/env bash
# Time-series batch inference driver (reference: Batch_infer.sh).
# Thin wrapper over the python driver; edit CKPT/DSET/ROOTS for deployment.
set -euo pipefail

CKPT="${1:?usage: Batch_infer.sh <checkpoint_dir> <scene_root>...}"
shift

python -m floodplanet_code_tpu.inference.batch_infer "$CKPT" floodplanet --roots "$@" --split all
