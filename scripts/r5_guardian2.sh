#!/bin/bash
# Second-stage round-5 guardian: after r5_guardian.sh (PID $1) finishes
# (catch-up passes + async-ckpt util re-measure), the TPU is free — run
# the inference-path sweep (VERDICT-r4 stretch #8) and a final bench at
# HEAD so BENCH-facing numbers carry the round-5 additions.
# Launch: setsid nohup bash scripts/r5_guardian2.sh <r5_guardian pid> > /tmp/r5_guardian2.log 2>&1 &
set -u
QPID=${1:?usage: r5_guardian2.sh <running r5_guardian pid>}
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "[guardian2] r5_guardian $QPID exited at $(date -u)"

export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
cd /root/repo
for try in 1 2 3; do
  timeout 1500 python scripts/perf_r5_infer_sweep.py && break
  echo "[guardian2] sweep attempt $try failed at $(date -u)"
  sleep 20
done

for try in 1 2 3; do
  timeout 1800 python bench.py > /root/repo/outputs/bench_r5_final.json && break
  echo "[guardian2] bench attempt $try failed at $(date -u)"
  sleep 20
done
cat /root/repo/outputs/bench_r5_final.json 2>/dev/null
echo "[guardian2] done at $(date -u)"
