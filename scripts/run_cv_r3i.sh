#!/bin/bash
# Round-3 session-6 extension queue (chain AFTER run_cv_r3h.sh — ONE TPU
# process at a time): a third warmed-EMA seed and the 3-member ensemble.
#
# Two-member ensembles (run_cv_r3g.sh) already quantify the lever; three
# independently-seeded members is the canonical deep-ensemble size
# (Lakshminarayanan et al. 2017 report most of the gain by k=3-5), so
# this adds seed 2 for all 5 folds and re-runs the ensemble eval with
# k=3, writing alongside the k=2 results for a members-vs-quality read.
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

W2=/root/repo/outputs/cv_r3_emaw_s2
echo "=== Arm W2: cosine+warmed-EMA seed 2, S1 ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh US-Carolina US-Nebraska \
  --batch_size 8 --n_epochs 33 \
  --out_dir "$W2" \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=true \
  --override seed_num=2

echo "=== Arm W2: cosine+warmed-EMA seed 2, L8 ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 33 \
  --out_dir "$W2" \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=true \
  --override seed_num=2

W0=/root/repo/outputs/cv_r3_emaw_s0
W1=/root/repo/outputs/cv_r3_emaw_s1
ENS3=/root/repo/outputs/ensemble_r3_k3
mkdir -p "$ENS3"
for fold in S1_Bangladesh S1_US-Carolina S1_US-Nebraska \
            L8_Bangladesh L8_US-Nebraska; do
  for d in "$W0" "$W1" "$W2"; do
    [ -d "$d/$fold/checkpoints" ] || {
      echo "[ensemble-k3] missing member for $fold"; continue 2; }
  done
  [ -f "$ENS3/$fold.json" ] && { echo "[ensemble-k3] done: $fold"; continue; }
  echo "=== ensemble k=3: $fold ($(date -u)) ==="
  timeout 1500 python -m floodplanet_code_tpu.tools.eval_ensemble \
    "$W0/$fold" "$W1/$fold" "$W2/$fold" --split valid \
    --out "$ENS3/$fold.json" || echo "[ensemble-k3] FAILED: $fold"
done
echo "=== r3i queue done: $(date -u) ==="
