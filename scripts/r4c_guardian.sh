#!/bin/bash
# Chain guardian: wait for the running endround_r4b.sh queue (PID $1)
# to exit, then run endround_r4c.sh — which idempotently re-checks the
# r4b items (fold records skip, fit resumes, ensemble skips if present)
# and then continues into the time-permitting extras (non-EMA soup on
# S1_Bangladesh, fixed-decay seed-1 S1 regen). Loops r4c until it
# completes without the watchdog giving up, so tunnel hangs don't end
# the evidence run.
# Launch: setsid nohup bash scripts/r4c_guardian.sh <pid> > /tmp/r4c_guardian.log 2>&1 &
set -u
QPID=${1:?usage: r4c_guardian.sh <running r4b pid>}
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "[guardian] r4b queue $QPID exited at $(date -u); chaining r4c"
for i in 1 2 3; do
  bash /root/repo/scripts/endround_r4c.sh >> /tmp/r4c.log 2>&1
  echo "[guardian] r4c pass $i done at $(date -u)"
done
