#!/bin/bash
# Round-5 session-2 TPU queue (sequential — ONE TPU process at a time):
#
#   1. Utilization-audit re-measure at HEAD (async + slim checkpoints)
#      -> outputs/util_r5_async/S1_Bangladesh/timing.json, the "after"
#      column of PERF.md "where the minutes go". Must run UNCONTENDED
#      (no concurrent pytest lane) — host-side contention inflates every
#      tunnel timing (the first attempt measured setup 50 s vs 31 s).
#   2. Inference-path sweep (VERDICT-r4 stretch #8)
#      -> outputs/perf_r5/infer_sweep.jsonl.
#   3. bench.py validation at HEAD -> outputs/bench_r5_validation.json.
#
# Idempotent: run_crossval skips recorded folds; the sweep and bench
# re-run cheaply. Launch:
#   setsid nohup bash scripts/endround_r5b.sh > /tmp/r5b.log 2>&1 &
set -u
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

run_with_retry() {
  local tries=0
  until timeout 3300 "$@"; do
    tries=$((tries + 1))
    echo "[watchdog] attempt $tries failed/timed out: $*" >&2
    [ "$tries" -ge 4 ] && { echo "[watchdog] giving up: $*" >&2; return 1; }
    sleep 20
  done
}

echo "=== [1] util re-measure (async+slim ckpt) at $(date -u) ==="
( cd /tmp/cvwork && run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor S1 --regions Bangladesh \
    --batch_size 8 --n_epochs 11 \
    --out_dir /root/repo/outputs/util_r5_async ) || echo "[util] FAILED"

echo "=== [2] inference sweep at $(date -u) ==="
( cd /root/repo && run_with_retry python scripts/perf_r5_infer_sweep.py ) \
  || echo "[sweep] FAILED"

echo "=== [3] bench validation at $(date -u) ==="
( cd /root/repo && run_with_retry python bench.py \
    > /root/repo/outputs/bench_r5_validation.json ) \
  && cat /root/repo/outputs/bench_r5_validation.json \
  || echo "[bench] FAILED"

echo "=== r5b queue done: $(date -u) ==="
