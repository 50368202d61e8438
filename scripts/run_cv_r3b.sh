#!/bin/bash
# Round-3 TPU batch 2, chained after run_cv_r3.sh (ONE TPU process rule):
#   1. wait for the batch-1 script (pid in /tmp/cv_r3.pid) to exit
#   2. cosine+EMA arm: 33 epochs, cosine LR, ema_decay 0.999
#   3. dihedral-TTA quality eval on the cosine arm's best checkpoints
#   4. fresh bench.py numbers at final HEAD
# Detach with:
#   nohup bash scripts/run_cv_r3b.sh > /tmp/cv_r3b.log 2>&1 & echo $! > /tmp/cv_r3b.pid
set -u
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
cd /tmp/cvwork
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

if [ -f /tmp/cv_r3.pid ]; then
  while kill -0 "$(cat /tmp/cv_r3.pid)" 2>/dev/null; do
    sleep 60
  done
fi

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

echo "=== phase 3: cosine + EMA arm ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh US-Carolina US-Nebraska \
  --batch_size 8 --n_epochs 33 --out_dir /root/repo/outputs/cv_r3_cosine_ema \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 33 --out_dir /root/repo/outputs/cv_r3_cosine_ema \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999

echo "=== phase 4: TTA quality eval on the cosine arm ==="
run_with_retry python /root/repo/scripts/eval_tta_r3.py \
  /root/repo/outputs/cv_r3_cosine/crossval_S1.json \
  /root/repo/outputs/cv_r3_cosine/crossval_L8.json \
  --out /root/repo/outputs/cv_r3_cosine/tta_eval.json

echo "=== phase 5: bench at final HEAD ==="
cd /root/repo && run_with_retry python bench.py

echo "=== batch 2 done ==="
