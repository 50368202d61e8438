#!/bin/bash
# Round-3 session-4 TPU queue (sequential — ONE TPU process at a time):
#
#  Arm W  — warmed-EMA recipe, seed 0, all 5 folds
#           (cosine 33ep + EMA 0.999 with the horizon-warmed decay,
#            train/state.ema_decay_at; config default ema_warmup=true).
#           Tests the round-3 hypothesis that fixed-decay EMA *lagged*
#           on the short noisy folds (RESULTS.md: L8 Bangladesh 0.517
#           with best epoch = last).
#  Arm A  — seed-1 replicate of the *fixed-decay* cosine+EMA arm
#           (ema_warmup=false pins the exact recipe the seed-0
#           outputs/cv_r3_cosine_ema runs used), to quantify
#           run-to-run spread of the beyond-reference recipe.
#
# Idempotent: run_crossval skips folds already recorded in out_dir.
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

echo "=== Arm W: cosine+warmed-EMA seed 0, S1 ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh US-Carolina US-Nebraska \
  --batch_size 8 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r3_cosine_emaw \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=true

echo "=== Arm W: cosine+warmed-EMA seed 0, L8 ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r3_cosine_emaw \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=true

echo "=== Arm A: fixed-decay cosine+EMA seed 1, S1 ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh US-Carolina US-Nebraska \
  --batch_size 8 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r3_cosine_ema_seed1 \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=false \
  --override seed_num=1

echo "=== Arm A: fixed-decay cosine+EMA seed 1, L8 ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r3_cosine_ema_seed1 \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=false \
  --override seed_num=1

echo "=== r3f queue done: $(date -u) ==="
