#!/bin/bash
# Round-3 session-7 TPU queue — EVIDENCE REGENERATION, priority order.
#
# The environment reset between sessions again deleted every
# non-git-tracked file under outputs/. RESULTS.md cites raw records
# that no longer exist:
#   outputs/cv_r3_cosine_emaw/crossval_*.json   (warmed-EMA arm — the
#       config-default recipe and best 5-fold mean claim)
#   outputs/cv_r3_cosine_ema/crossval_L8.json   (fixed-decay L8 0.517 /
#       0.280 — the "warmup lag" evidence)
#   outputs/cv_r3_cosine_ema_seed1/crossval_*.json (0.523 replicate)
#   outputs/cv_r3_cosine_ema/tta_eval.json
#
# This queue regenerates them most-load-bearing-first and FASTEST-first
# (L8 folds train on 1 region, ~330-860 total steps — minutes each;
# S1 folds are ~3x slower), so whatever wall-clock survives produces
# committed records. Idempotent: run_crossval skips recorded folds.
set -u
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
cd /tmp/cvwork
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

run_with_retry() {
  local tries=0
  until timeout 2400 "$@"; do
    tries=$((tries + 1))
    echo "[watchdog] attempt $tries failed/timed out: $*" >&2
    if [ "$tries" -ge 8 ]; then
      echo "[watchdog] giving up: $*" >&2
      return 1
    fi
    sleep 20
  done
}

W=/root/repo/outputs/cv_r3_cosine_emaw

# --- 1. Warmed-EMA L8 (the 0.665 recovery claim; fastest folds) ---
echo "=== [1] warmed-EMA seed 0, L8 ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 33 \
  --out_dir "$W" \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=true

# --- 2. Fixed-decay L8 seed 0 (cv_r3_cosine_ema L8 records: 0.517/0.280) ---
echo "=== [2] fixed-decay EMA seed 0, L8 ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r3_cosine_ema \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=false

# --- 3. Fixed-decay L8 Bangladesh seed 1 (the 0.523 replicate) ---
echo "=== [3] fixed-decay EMA seed 1, L8 Bangladesh ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh \
  --batch_size 10 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r3_cosine_ema_seed1 \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=false \
  --override seed_num=1

# --- 4. Warmed-EMA S1, Bangladesh first (0.585), then Carolina (0.692),
#        then Nebraska (0.343) — one invocation per region so partial
#        wall-clock still lands records ---
for region in Bangladesh US-Carolina US-Nebraska; do
  echo "=== [4] warmed-EMA seed 0, S1 $region ($(date -u)) ==="
  run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor S1 --regions "$region" \
    --batch_size 8 --n_epochs 33 \
    --out_dir "$W" \
    --override lr_schedule=cosine --override lr_warmup_steps=100 \
    --override ema_decay=0.999 --override ema_warmup=true
done

# --- 5. Dihedral-TTA eval on whatever warmed checkpoints now exist ---
echo "=== [5] TTA eval ($(date -u)) ==="
timeout 1800 python /root/repo/scripts/eval_tta_r3.py \
  "$W"/crossval_*.json --out "$W/tta_eval.json" \
  || echo "[tta] FAILED/timeout"

echo "=== r3j queue done: $(date -u) ==="
