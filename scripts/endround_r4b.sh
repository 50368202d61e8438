#!/bin/bash
# Round-4 session-N TPU queue (post-reset). The reset wiped all
# checkpoint weights under outputs/ (only git-tracked JSON records
# survive), so the remaining VERDICT-r3 evidence items are re-ordered
# by value-per-minute:
#
#   0. bench.py once — validates the new roofline fields end-to-end on
#      the real chip before the driver's end-of-round run.
#   1. 11-epoch L8 US-Nebraska seeds 0/1/2 — committed n=3
#      characterization of the noisy fold at its best (short) recipe
#      vs the reference's 0.431.
#   2. S1 US-Nebraska warmed-EMA seeds 0/1/2 WITH --soup (fresh dirs;
#      resume is record-granular so the wiped r4 arms can't be reused),
#      then the k=3 deep ensemble -> outputs/ensemble_r4/S1_US-Nebraska
#      .json — the one missing primary-fold ensemble cell, plus the
#      EMA-arm soup records in the same runs.
#   3. (time permitting) non-EMA cosine + --soup on L8_Bangladesh —
#      the non-EMA soup evidence.
#
# Everything is idempotent; the evidence watcher commits records as
# they land, so partial wall-clock still banks progress.
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

echo "=== [0] bench roofline validation ($(date -u)) ==="
( cd /root/repo && timeout 1200 python bench.py ) || echo "[bench] FAILED"

echo "=== [1] 11-epoch L8 US-Nebraska seed characterization ($(date -u)) ==="
for seed in 0 1 2; do
  run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor L8 --regions US-Nebraska \
    --batch_size 10 --n_epochs 11 \
    --out_dir /root/repo/outputs/cv_r4_11ep_seed"$seed" \
    --override seed_num="$seed" \
    || echo "[11ep] FAILED seed $seed"
done

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

echo "=== r4b queue done: $(date -u) ==="
