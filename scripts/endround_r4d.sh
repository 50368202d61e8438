#!/bin/bash
# Lean finisher for the round-4 evidence queue: seed-2 S1 US-Nebraska
# member WITHOUT --soup (the EMA-arm soup documented-negative already
# has committed records from seeds 0/1; skipping saves ~15 min of val
# passes), then the k=3 deep ensemble over cv_r4ens_seed{0,1,2} — the
# one missing primary-fold ensemble cell. Idempotent.
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

echo "=== seed-2 S1 US-Nebraska member, no soup ($(date -u)) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions US-Nebraska \
  --batch_size 8 --n_epochs 33 \
  --out_dir /root/repo/outputs/cv_r4ens_seed2 \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999 --override ema_warmup=true \
  --override seed_num=2 \
  || echo "[ens-member] FAILED seed 2"

if [ ! -f "$ENS/S1_US-Nebraska.json" ]; then
  echo "=== k=3 ensemble S1 US-Nebraska ($(date -u)) ==="
  run_with_retry python -m floodplanet_code_tpu.tools.eval_ensemble \
    /root/repo/outputs/cv_r4ens_seed0/S1_US-Nebraska \
    /root/repo/outputs/cv_r4ens_seed1/S1_US-Nebraska \
    /root/repo/outputs/cv_r4ens_seed2/S1_US-Nebraska \
    --split valid --out "$ENS/S1_US-Nebraska.json" \
    || echo "[ensemble] FAILED: S1_US-Nebraska"
fi
echo "=== r4d done: $(date -u) ==="
