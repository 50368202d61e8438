#!/bin/bash
# Round-4 continuation queue (session N+1). State on entry:
#   - endround_r4b [0] bench validation: DONE (outputs/bench_r4, committed)
#   - [1] 11-epoch L8 US-Nebraska seeds 0/1/2: DONE (cv_r4_11ep_seed*)
#   - [2] S1 US-Nebraska ens members: seed0 DONE (+soup), seed1 mid-fold
#     (checkpoints to epoch 18 SURVIVED this reset), seed2 not started;
#     k=3 ensemble record missing.
#   - [3] non-EMA cosine+soup L8_Bangladesh: not started.
# This queue finishes [2] and [3], then (time permitting) extends the
# non-EMA soup arm and the fixed-decay seed-1 regen. Idempotent: fold
# records skip, fit_model resumes within-fold, ensemble skips if the
# output exists. The evidence watcher commits records as they land.
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
    [ "$tries" -ge 5 ] && { echo "[watchdog] giving up: $*" >&2; return 1; }
    sleep 20
  done
}

ENS=/root/repo/outputs/ensemble_r4
mkdir -p "$ENS"

echo "=== [2] S1 US-Nebraska warmed-EMA seeds + k=3 ensemble ($(date -u)) ==="
members=()
for seed in 0 1 2; do
  arm=/root/repo/outputs/cv_r4ens_seed"$seed"
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

echo "=== [3] non-EMA cosine + soup, L8_Bangladesh ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh \
  --batch_size 10 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r4_cosine_soup --soup \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  || echo "[soup-arm] FAILED"

echo "=== [4] (time permitting) non-EMA soup, S1_Bangladesh ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh \
  --batch_size 8 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r4_cosine_soup --soup \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  || echo "[soup-arm] FAILED"

echo "=== [5] (time permitting) fixed-decay EMA seed-1 S1 regen ($(date -u)) ==="
for fold in S1_Bangladesh S1_US-Carolina S1_US-Nebraska; do
  sensor=${fold%%_*}; region=${fold#*_}
  run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor "$sensor" --regions "$region" \
    --batch_size 8 --n_epochs 33 \
    --out_dir /root/repo/outputs/cv_r3_cosine_ema_seed1 \
    --override lr_schedule=cosine --override lr_warmup_steps=100 \
    --override ema_decay=0.999 --override ema_warmup=false \
    --override seed_num=1 \
    || echo "[seed1-regen] FAILED $fold"
done

echo "=== r4c queue done: $(date -u) ==="
