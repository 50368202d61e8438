#!/bin/bash
# Greedy checkpoint soup over every completed round-3 fold experiment
# (tools/soup_checkpoints.py). Run AFTER the training queue drains — ONE
# TPU process at a time. Idempotent: folds with a soup.json are skipped.
set -u
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
cd /tmp/cvwork
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

for exp in /root/repo/outputs/cv_r3_cosine_ema/S1_US-Nebraska \
           /root/repo/outputs/cv_r3_cosine_ema/L8_Bangladesh \
           /root/repo/outputs/cv_r3_cosine_ema/L8_US-Nebraska \
           /root/repo/outputs/cv_r3_cosine_emaw/*_* \
           /root/repo/outputs/cv_r3_cosine_ema_seed1/*_*; do
  [ -d "$exp/checkpoints" ] || continue
  [ -f "$exp/checkpoints/soup-greedy/soup.json" ] && {
    echo "[soup] already done: $exp"; continue; }
  echo "=== soup: $exp ($(date -u)) ==="
  timeout 1500 python -m floodplanet_code_tpu.tools.soup_checkpoints \
    "$exp" --mode greedy || echo "[soup] FAILED: $exp"
done
echo "=== soup_r3 done: $(date -u) ==="
