#!/bin/bash
# Round-3 recovery driver: the axon relay died mid-sweep (ROUND_NOTES
# session-2 note). This script waits — indefinitely — for the relay to
# accept connections again, lets the batch-2 driver (run_cv_r3b.sh)
# finish/exhaust first, then re-runs every remaining phase. All phases
# are idempotent: run_crossval skips recorded folds, fit early-exits
# fully-trained experiments, so completed work costs nothing.
# Detach with:
#   nohup bash scripts/run_cv_r3c.sh > /tmp/cv_r3c.log 2>&1 & echo $! > /tmp/cv_r3c.pid
set -u
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
cd /tmp/cvwork
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

echo "=== waiting for the axon relay (127.0.0.1:8082) ==="
until python3 - <<'EOF'
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8082), 3).close()
except OSError:
    sys.exit(1)
EOF
do
  sleep 120
done
echo "=== relay is back: $(date -u) ==="

# ONE TPU process rule: wait for the batch-2 driver's pipeline to drain.
if [ -f /tmp/cv_r3b.pid ]; then
  while kill -0 "$(cat /tmp/cv_r3b.pid)" 2>/dev/null; do
    sleep 60
  done
fi

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

echo "=== cosine+EMA S1 (resume) ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor S1 --regions Bangladesh US-Carolina US-Nebraska \
  --batch_size 8 --n_epochs 33 --out_dir /root/repo/outputs/cv_r3_cosine_ema \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999
echo "=== cosine+EMA L8 ==="
run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
  --sensor L8 --regions Bangladesh US-Nebraska \
  --batch_size 10 --n_epochs 33 --out_dir /root/repo/outputs/cv_r3_cosine_ema \
  --override lr_schedule=cosine --override lr_warmup_steps=100 \
  --override ema_decay=0.999

echo "=== TTA quality eval on the cosine arm ==="
run_with_retry python /root/repo/scripts/eval_tta_r3.py \
  /root/repo/outputs/cv_r3_cosine/crossval_S1.json \
  /root/repo/outputs/cv_r3_cosine/crossval_L8.json \
  --out /root/repo/outputs/cv_r3_cosine/tta_eval.json

echo "=== bench at final HEAD ==="
# Redirect INSIDE the retried command so a timed-out partial attempt is
# overwritten by the next one — the file always holds one JSON document.
cd /root/repo && run_with_retry bash -c 'python bench.py > /tmp/bench_r3_final.json'
cat /tmp/bench_r3_final.json

echo "=== recovery driver done: $(date -u) ==="
