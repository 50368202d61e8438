#!/bin/bash
# Round-5 TPU queue (sequential — ONE TPU process at a time), ordered by
# VERDICT-r4 value ranking:
#
#   0. Utilization-audit fold — one 11-epoch S1 Bangladesh fold at the
#      production recipe (300^2, b8, device cache, augmented). The new
#      fit instrumentation writes timing.json (setup/compile/train/eval/
#      ckpt decomposition) -> PERF.md "where the minutes go".
#   1. S1 US-Nebraska warmed-EMA seeds 0/1/2 WITH --soup into fresh
#      r5 dirs (the r4 checkpoints were wiped by a session reset; the
#      committed crossval JSONs survive as the reproducibility yardstick
#      — same-seed runs rematch to 3-4 decimals), then the k=3 deep
#      ensemble -> outputs/ensemble_r5/S1_US-Nebraska.json: the one
#      missing primary-fold ensemble cell.
#   2. Non-EMA cosine + --soup on L8 Bangladesh -> the non-EMA soup
#      documented-negative (or win) arm.
#   3. Seed-1 fixed-decay regens: S1 all 3 folds + L8 US-Nebraska into
#      outputs/cv_r3_cosine_ema_seed1 — makes the last two
#      quoted-without-record RESULTS.md cells record-backed.
#   4. bench.py once — validates the round-5 bench additions
#      (inference MFU) on the real chip before the driver's run.
#
# Idempotent: run_crossval skips recorded folds, fit resumes from the
# latest checkpoint, ensemble/soup skip if their JSON exists. The
# evidence watcher commits records as they land.
set -u
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
cd /tmp/cvwork
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

run_with_retry() {
  local tries=0
  until timeout 3300 "$@"; do
    tries=$((tries + 1))
    echo "[watchdog] attempt $tries failed/timed out: $*" >&2
    [ "$tries" -ge 6 ] && { echo "[watchdog] giving up: $*" >&2; return 1; }
    sleep 20
  done
}

echo "=== [0] utilization-audit fold: S1 Bangladesh, 11 ep ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh \
  --batch_size 8 --n_epochs 11 \
  --out_dir /root/repo/outputs/util_r5 \
  || echo "[util] FAILED"

echo "=== [1] S1 US-Nebraska warmed-EMA seeds + k=3 ensemble ($(date -u)) ==="
ENS=/root/repo/outputs/ensemble_r5
mkdir -p "$ENS"
members=()
for seed in 0 1 2; do
  arm=/root/repo/outputs/cv_r5ens_seed"$seed"
  members+=("$arm/S1_US-Nebraska")
  run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor S1 --regions US-Nebraska \
    --batch_size 8 --n_epochs 33 \
    --out_dir "$arm" --soup \
    --override lr_schedule=cosine --override lr_warmup_steps=100 \
    --override ema_decay=0.999 --override ema_warmup=true \
    --override seed_num="$seed" \
    || echo "[ens-member] FAILED seed $seed"
done
if [ ! -f "$ENS/S1_US-Nebraska.json" ]; then
  timeout 1800 python -m floodplanet_code_tpu.tools.eval_ensemble \
    "${members[@]}" --split valid --out "$ENS/S1_US-Nebraska.json" \
    || echo "[ensemble] FAILED: S1_US-Nebraska"
fi

echo "=== [2] non-EMA cosine + soup, L8 Bangladesh ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh \
  --batch_size 10 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r5_cosine_soup --soup \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  || echo "[soup-arm] FAILED"

echo "=== [3a] seed-1 fixed-decay S1, 3 folds ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh US-Carolina US-Nebraska \
  --batch_size 8 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r3_cosine_ema_seed1 \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=false \
  --override seed_num=1 \
  || echo "[seed1-S1] FAILED"

echo "=== [3b] seed-1 fixed-decay L8 US-Nebraska ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r3_cosine_ema_seed1 \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=false \
  --override seed_num=1 \
  || echo "[seed1-L8] FAILED"

echo "=== [4] bench validation ($(date -u)) ==="
( cd /root/repo && timeout 1800 python bench.py > /root/repo/outputs/bench_r5_validation.json ) \
  && cat /root/repo/outputs/bench_r5_validation.json \
  || echo "[bench] FAILED"

echo "=== r5 queue done: $(date -u) ==="
