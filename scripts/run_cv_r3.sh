#!/bin/bash
# Round-3 quality runs on the TPU tunnel (ONE TPU process at a time).
#
# Phase 1: parity recipe at HEAD (same as RESULTS.md round-2 runs) —
#          validates the round-3 perf rewrites (dihedral-fused aug, conv
#          upsample, bf16 aug) left quality unchanged.
# Phase 2: beyond-reference recipe — 33 epochs, cosine LR with warmup
#          (lr_schedule knob added this round).
#
# Tunnel runs hang ~1 in 3; every invocation is wrapped in timeout+retry
# (run_crossval and fit both resume from their own state, so retries are
# cheap). Detach with:
#   setsid nohup bash scripts/run_cv_r3.sh > /tmp/cv_r3.log 2>&1 &
set -u
# Run from a scratch dir whose dataset_dirs.json points at the real data
# root (the repo's tracked one is a user placeholder); results still land
# under the repo via absolute --out_dir paths.
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
cd /tmp/cvwork
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

run_with_retry() {
  local tries=0
  until timeout 2700 "$@"; do
    tries=$((tries + 1))
    echo "[watchdog] attempt $tries failed/timed out: $*" >&2
    if [ "$tries" -ge 8 ]; then
      echo "[watchdog] giving up: $*" >&2
      return 1
    fi
    sleep 10
  done
}

echo "=== phase 1: parity recipe at HEAD ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh US-Carolina US-Nebraska \
  --batch_size 8 --n_epochs 11 --out_dir /root/repo/outputs/cv_r3head
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 11 --out_dir /root/repo/outputs/cv_r3head

echo "=== phase 2: cosine 33-epoch arm ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh US-Carolina US-Nebraska \
  --batch_size 8 --n_epochs 33 --out_dir /root/repo/outputs/cv_r3_cosine \
  --override lr_schedule=cosine --override lr_warmup_steps=100
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 33 --out_dir /root/repo/outputs/cv_r3_cosine \
  --override lr_schedule=cosine --override lr_warmup_steps=100

echo "=== done ==="
