#!/bin/bash
# Round-3 session-6 TPU queue (sequential — ONE TPU process at a time).
#
# The environment reset between sessions deleted every checkpoint dir
# under outputs/cv_r3_* (only the git-tracked crossval_*.json records
# survive), which blocked the in-flight deep-ensemble eval
# (scripts/ensemble_r3.sh). This queue regenerates members with the
# BEST recipe (warmed-EMA — the config default, RESULTS.md round-3
# follow-up table) and then completes the ensemble + soup passes:
#
#  Arm W0 — warmed-EMA seed 0, all 5 folds (regeneration; the surviving
#           outputs/cv_r3_cosine_emaw/crossval_*.json records pin the
#           expected numbers, so this doubles as a seed-0 replicate
#           check: run_crossval skips recorded folds, hence a fresh
#           out_dir).
#  Arm W1 — warmed-EMA seed 1, all 5 folds (new: quantifies seed spread
#           of the *default* recipe AND provides the second ensemble
#           member).
#  Ensemble — softmax-average the two seeds per fold on the val split
#           (tools/eval_ensemble.py).
#  Soup   — greedy checkpoint soup over each regenerated experiment.
#
# Idempotent: run_crossval skips folds already recorded in out_dir;
# ensemble/soup skip folds with existing result JSONs.
set -u
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
cd /tmp/cvwork
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

run_with_retry() {
  local tries=0
  until timeout 2700 "$@"; do
    tries=$((tries + 1))
    echo "[watchdog] attempt $tries failed/timed out: $*" >&2
    if [ "$tries" -ge 12 ]; then
      echo "[watchdog] giving up: $*" >&2
      return 1
    fi
    sleep 30
  done
}

W0=/root/repo/outputs/cv_r3_emaw_s0
W1=/root/repo/outputs/cv_r3_emaw_s1

for seed in 0 1; do
  out=$([ "$seed" = 0 ] && echo "$W0" || echo "$W1")
  echo "=== Arm W$seed: cosine+warmed-EMA seed $seed, S1 ($(date -u)) ==="
  run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor S1 --regions Bangladesh US-Carolina US-Nebraska \
    --batch_size 8 --n_epochs 33 \
    --out_dir "$out" \
    --override lr_schedule=cosine --override lr_warmup_steps=100 \
    --override ema_decay=0.999 --override ema_warmup=true \
    --override seed_num=$seed

  echo "=== Arm W$seed: cosine+warmed-EMA seed $seed, L8 ($(date -u)) ==="
  run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor L8 --regions Bangladesh US-Nebraska \
    --batch_size 10 --n_epochs 33 \
    --out_dir "$out" \
    --override lr_schedule=cosine --override lr_warmup_steps=100 \
    --override ema_decay=0.999 --override ema_warmup=true \
    --override seed_num=$seed
done

ENS=/root/repo/outputs/ensemble_r3
mkdir -p "$ENS"
for fold in S1_Bangladesh S1_US-Carolina S1_US-Nebraska \
            L8_Bangladesh L8_US-Nebraska; do
  [ -d "$W0/$fold/checkpoints" ] && [ -d "$W1/$fold/checkpoints" ] || {
    echo "[ensemble] missing member for $fold"; continue; }
  [ -f "$ENS/$fold.json" ] && { echo "[ensemble] done: $fold"; continue; }
  echo "=== ensemble: $fold ($(date -u)) ==="
  timeout 1500 python -m floodplanet_code_tpu.tools.eval_ensemble \
    "$W0/$fold" "$W1/$fold" --split valid --out "$ENS/$fold.json" \
    || echo "[ensemble] FAILED: $fold"
done

for exp in "$W0"/*_* "$W1"/*_*; do
  [ -d "$exp/checkpoints" ] || continue
  [ -f "$exp/checkpoints/soup-greedy/soup.json" ] && {
    echo "[soup] already done: $exp"; continue; }
  echo "=== soup: $exp ($(date -u)) ==="
  timeout 1500 python -m floodplanet_code_tpu.tools.soup_checkpoints \
    "$exp" --mode greedy || echo "[soup] FAILED: $exp"
done
echo "=== r3g queue done: $(date -u) ==="
