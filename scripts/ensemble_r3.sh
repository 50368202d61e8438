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

# Second pass: every member with surviving checkpoints (the seed-0 EMA
# S1 Bangladesh/Carolina dirs were lost to the relay outage, so this is
# 3-member where all arms survive, emaw+seed1 elsewhere). Cross-arm
# ensembling (fixed vs warmed EMA decay) is still a same-fold ensemble.
ALL=/root/repo/outputs/ensemble_r3_all
mkdir -p "$ALL"
for fold in S1_Bangladesh S1_US-Carolina S1_US-Nebraska \
            L8_Bangladesh L8_US-Nebraska; do
  members=()
  for arm in cv_r3_cosine_ema cv_r3_cosine_ema_seed1 cv_r3_cosine_emaw; do
    [ -d "/root/repo/outputs/$arm/$fold/checkpoints" ] \
      && members+=("/root/repo/outputs/$arm/$fold")
  done
  [ "${#members[@]}" -ge 2 ] || {
    echo "[ensemble-all] <2 members for $fold"; continue; }
  [ -f "$ALL/$fold.json" ] && { echo "[ensemble-all] done: $fold"; continue; }
  echo "=== ensemble-all (${#members[@]} members): $fold ($(date -u)) ==="
  timeout 1500 python -m floodplanet_code_tpu.tools.eval_ensemble \
    "${members[@]}" --split valid --out "$ALL/$fold.json" \
    || echo "[ensemble-all] FAILED: $fold"
done
echo "=== ensemble_r3 done: $(date -u) ==="
