#!/bin/bash
# Session-immune guardian for scripts/endround_r4b.sh: waits for the
# currently-running queue (PID $1) to exit, then re-runs the queue once.
# The queue is idempotent (fold records + within-fold checkpoint resume
# + ensemble/soup skip-if-present), so this is a no-op if the first run
# completed, and a resume if the session's end killed it mid-fold.
# Launch: setsid nohup bash scripts/r4b_guardian.sh <pid> > /tmp/guardian.log 2>&1 &
set -u
QPID=${1:?usage: r4b_guardian.sh <queue pid>}
while kill -0 "$QPID" 2>/dev/null; do sleep 60; done
echo "[guardian] queue $QPID exited at $(date -u); re-running once"
bash /root/repo/scripts/endround_r4b.sh >> /tmp/r4b.log 2>&1
echo "[guardian] done at $(date -u)"
