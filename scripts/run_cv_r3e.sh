#!/bin/bash
# Round-3 arm: seed-1 replicate of the cosine+EMA recipe on all 5 folds.
# Purpose: quantify run-to-run spread of the beyond-reference recipe the
# same way RESULTS.md does for the reference recipe (outputs/cv_seed1) —
# single-seed claims on 1-2-training-region folds are otherwise
# uninterpretable (documented 16-pt spread on the L8 Nebraska fold).
# Idempotent: run_crossval skips folds already recorded in the out_dir.
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

echo "=== cosine+EMA seed 1, S1 ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh US-Carolina US-Nebraska \
  --batch_size 8 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r3_cosine_ema_seed1 \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override seed_num=1
echo "=== cosine+EMA seed 1, L8 ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r3_cosine_ema_seed1 \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override seed_num=1
echo "=== seed-1 replicate done: $(date -u) ==="
