#!/bin/bash
# Two-seed deep-ensemble eval on every cosine+EMA fold: members are the
# seed-0 (outputs/cv_r3_cosine_ema) and seed-1
# (outputs/cv_r3_cosine_ema_seed1) best checkpoints; softmax-averaged on
# the fold's val split (tools/eval_ensemble.py). ONE TPU process at a
# time. Idempotent: folds with a recorded result are skipped.
set -u
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
cd /tmp/cvwork
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

OUT=/root/repo/outputs/ensemble_r3
mkdir -p "$OUT"

for fold in S1_Bangladesh S1_US-Carolina S1_US-Nebraska \
            L8_Bangladesh L8_US-Nebraska; do
  a=/root/repo/outputs/cv_r3_cosine_ema/$fold
  b=/root/repo/outputs/cv_r3_cosine_ema_seed1/$fold
  [ -d "$a/checkpoints" ] && [ -d "$b/checkpoints" ] || {
    echo "[ensemble] missing member for $fold"; continue; }
  [ -f "$OUT/$fold.json" ] && { echo "[ensemble] done: $fold"; continue; }
  echo "=== ensemble: $fold ($(date -u)) ==="
  timeout 1500 python -m floodplanet_code_tpu.tools.eval_ensemble \
    "$a" "$b" --split valid --out "$OUT/$fold.json" \
    || echo "[ensemble] FAILED: $fold"
done
echo "=== ensemble_r3 done: $(date -u) ==="
