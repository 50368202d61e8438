#!/bin/bash
# Round-3 session-6 follow-up TPU queue (chain AFTER run_cv_r3g.sh — ONE
# TPU process at a time).
#
# 1. Re-evidence the fixed-decay EMA-lag finding with *committed* raw
#    records: the original cv_r3_cosine_ema L8 records (0.517 seed 0 /
#    0.523 seed 1 on Bangladesh — the RESULTS.md "warmup lag, not noise"
#    comparison) were lost to the environment reset. Two short L8
#    Bangladesh folds with ema_warmup=false replicate them.
# 2. Dihedral-TTA quality eval on the regenerated warmed-EMA
#    checkpoints (the lost tta_eval.json covered only the 3
#    outage-surviving folds; this covers all 5).
# 3. Fresh bench at HEAD.
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

for seed in 0 1; do
  echo "=== fixed-decay EMA L8 Bangladesh, seed $seed ($(date -u)) ==="
  run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor L8 --regions Bangladesh \
    --batch_size 10 --n_epochs 33 \
    --out_dir /root/repo/outputs/cv_r3_emafix_s$seed \
    --override lr_schedule=cosine --override lr_warmup_steps=100 \
    --override ema_decay=0.999 --override ema_warmup=false \
    --override seed_num=$seed
done

W0=/root/repo/outputs/cv_r3_emaw_s0
if [ -f "$W0/crossval_S1.json" ] && [ ! -f "$W0/tta_eval.json" ]; then
  echo "=== dihedral TTA eval on warmed-EMA seed 0 ($(date -u)) ==="
  run_with_retry python /root/repo/scripts/eval_tta_r3.py \
    "$W0/crossval_S1.json" "$W0/crossval_L8.json" \
    --out "$W0/tta_eval.json"
fi

echo "=== fresh bench at HEAD ($(date -u)) ==="
cd /root/repo
timeout 560 python bench.py > /tmp/bench_r3s6.json 2>/tmp/bench_r3s6.err \
  || timeout 560 python bench.py > /tmp/bench_r3s6.json 2>/tmp/bench_r3s6.err \
  || echo "[bench] FAILED"
cat /tmp/bench_r3s6.json
echo "=== r3h queue done: $(date -u) ==="
