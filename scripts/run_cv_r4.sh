#!/bin/bash
# Round-4 TPU queue — VERDICT r3 items #2 (evidence ledger) and #3
# (noisy-fold quality via k=3 deep ensembles on the warmed-EMA recipe).
#
# Plan (most load-bearing first; every phase idempotent, every record
# committed by the evidence watcher as it lands):
#   0. Ensemble the checkpoints that SURVIVE on disk right now (zero
#      training): L8_Bangladesh 3-member, L8_US-Nebraska 2-member.
#   1. Per fold (S1_US-Nebraska, L8_US-Nebraska, S1_Bangladesh,
#      S1_US-Carolina, L8_Bangladesh): train warmed-EMA seed 1, then
#      seed 2, then eval the k=3 ensemble {seed0 (r3 emaw), seed1,
#      seed2} -> outputs/ensemble_r4/<fold>.json. Noisy folds first so
#      partial wall-clock still answers the Nebraska-variance question.
#   2. Non-EMA cosine arm re-run with --soup (the non-EMA soup records
#      VERDICT asks for; EMA-arm soup is a documented negative).
#   3. Fixed-decay seed-1 regen (S1 x3 + L8 US-Nebraska) — restores the
#      quoted-but-lost RESULTS.md cells.
set -u
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
cd /tmp/cvwork
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}

run_with_retry() {
  local tries=0
  # >=3000s per attempt (ADVICE r3: 2400 left too little headroom over
  # the observed 2132s fold; resume is fold-granular so a timeout burns
  # the whole fold).
  until timeout 3300 "$@"; do
    tries=$((tries + 1))
    echo "[watchdog] attempt $tries failed/timed out: $*" >&2
    if [ "$tries" -ge 6 ]; then
      echo "[watchdog] giving up: $*" >&2
      return 1
    fi
    sleep 20
  done
}

R3EMAW=/root/repo/outputs/cv_r3_cosine_emaw
R3EMA=/root/repo/outputs/cv_r3_cosine_ema
R3SEED1=/root/repo/outputs/cv_r3_cosine_ema_seed1
S1_ARM=/root/repo/outputs/cv_r4_emaw_seed1
S2_ARM=/root/repo/outputs/cv_r4_emaw_seed2
ENS=/root/repo/outputs/ensemble_r4
ENS_SURV=/root/repo/outputs/ensemble_r4_surviving
mkdir -p "$ENS" "$ENS_SURV"

ensemble() {  # ensemble <out.json> <member_dir>...
  local out=$1; shift
  [ -f "$out" ] && { echo "[ensemble] done: $out"; return 0; }
  for m in "$@"; do
    [ -d "$m/checkpoints" ] || { echo "[ensemble] missing member $m"; return 1; }
  done
  timeout 1800 python -m floodplanet_code_tpu.tools.eval_ensemble \
    "$@" --split valid --out "$out" || echo "[ensemble] FAILED: $out"
}

# --- Phase 0: ensembles over surviving r3 checkpoints (no training) ---
echo "=== [0] surviving-member ensembles ($(date -u)) ==="
ensemble "$ENS_SURV/L8_Bangladesh.json" \
  "$R3EMAW/L8_Bangladesh" "$R3EMA/L8_Bangladesh" "$R3SEED1/L8_Bangladesh"
ensemble "$ENS_SURV/L8_US-Nebraska.json" \
  "$R3EMAW/L8_US-Nebraska" "$R3EMA/L8_US-Nebraska"

# --- Phase 1: warmed-EMA seeds 1+2 per fold, then the k=3 ensemble ---
fold_batch() { [ "${1%%_*}" = L8 ] && echo 10 || echo 8; }
for fold in S1_US-Nebraska L8_US-Nebraska S1_Bangladesh \
            S1_US-Carolina L8_Bangladesh; do
  sensor=${fold%%_*}; region=${fold#*_}; bs=$(fold_batch "$fold")
  for seed in 1 2; do
    arm_dir=$([ "$seed" = 1 ] && echo "$S1_ARM" || echo "$S2_ARM")
    echo "=== [1] warmed-EMA seed $seed, $fold ($(date -u)) ==="
    run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
      --sensor "$sensor" --regions "$region" \
      --batch_size "$bs" --n_epochs 33 \
      --out_dir "$arm_dir" \
      --override lr_schedule=cosine --override lr_warmup_steps=100 \
      --override ema_decay=0.999 --override ema_warmup=true \
      --override seed_num="$seed"
  done
  echo "=== [1] k=3 ensemble, $fold ($(date -u)) ==="
  ensemble "$ENS/$fold.json" \
    "$R3EMAW/$fold" "$S1_ARM/$fold" "$S2_ARM/$fold"
done

# --- Phase 2: non-EMA cosine arm with greedy soup per fold ---
SOUP_ARM=/root/repo/outputs/cv_r4_cosine_soup
for fold in L8_Bangladesh L8_US-Nebraska S1_Bangladesh \
            S1_US-Carolina S1_US-Nebraska; do
  sensor=${fold%%_*}; region=${fold#*_}; bs=$(fold_batch "$fold")
  echo "=== [2] cosine (no EMA) + soup, $fold ($(date -u)) ==="
  run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor "$sensor" --regions "$region" \
    --batch_size "$bs" --n_epochs 33 \
    --out_dir "$SOUP_ARM" --soup \
    --override lr_schedule=cosine --override lr_warmup_steps=100
done

# --- Phase 3: fixed-decay EMA seed-1 regen (lost RESULTS.md cells) ---
for fold in L8_US-Nebraska S1_Bangladesh S1_US-Carolina S1_US-Nebraska; do
  sensor=${fold%%_*}; region=${fold#*_}; bs=$(fold_batch "$fold")
  echo "=== [3] fixed-decay EMA seed 1, $fold ($(date -u)) ==="
  run_with_retry python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor "$sensor" --regions "$region" \
    --batch_size "$bs" --n_epochs 33 \
    --out_dir "$R3SEED1" \
    --override lr_schedule=cosine --override lr_warmup_steps=100 \
    --override ema_decay=0.999 --override ema_warmup=false \
    --override seed_num=1
done

echo "=== r4 queue done: $(date -u) ==="
