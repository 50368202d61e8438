#!/bin/bash
# Round-5 chain guardian: wait for the running endround_r5.sh queue
# (PID $1) to exit, then (a) re-run the idempotent queue to catch any
# phase its watchdog abandoned (fold records skip, fits resume,
# ensemble/soup skip when their JSON exists), and (b) re-measure the
# utilization-audit fold (S1 Bangladesh, 11 epochs, production recipe)
# against HEAD — which now carries async checkpoint writes — into
# outputs/util_r5_async, giving PERF.md its before/after pair.
# Launch: setsid nohup bash scripts/r5_guardian.sh <pid> > /tmp/r5_guardian.log 2>&1 &
set -u
QPID=${1:?usage: r5_guardian.sh <running endround_r5 pid>}
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "[guardian] r5 queue $QPID exited at $(date -u)"

for pass in 1 2; do
  echo "[guardian] idempotent catch-up pass $pass at $(date -u)"
  bash /root/repo/scripts/endround_r5.sh >> /tmp/r5_catchup.log 2>&1
done

echo "[guardian] util re-measure (async ckpt) at $(date -u)"
mkdir -p /tmp/cvwork
printf '{"floodplanet": "/root/reference/"}\n' > /tmp/cvwork/dataset_dirs.json
cd /tmp/cvwork
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
for try in 1 2 3; do
  timeout 3300 python -m floodplanet_code_tpu.tools.run_crossval \
    --sensor S1 --regions Bangladesh \
    --batch_size 8 --n_epochs 11 \
    --out_dir /root/repo/outputs/util_r5_async && break
  echo "[guardian] util re-measure attempt $try failed at $(date -u)"
  sleep 20
done
cp /root/repo/outputs/util_r5_async/S1_Bangladesh/timing.json \
   /root/repo/outputs/util_r5_async/timing_S1_Bangladesh.json 2>/dev/null
echo "[guardian] done at $(date -u)"
