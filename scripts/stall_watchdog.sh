#!/bin/bash
# Tunnel-stall watchdog for a running TPU queue (scripts/run_cv_r4.sh).
#
# The axon tunnel randomly hangs long runs (~1 in 3; ROUND_NOTES
# methodology note). The queue's own per-attempt timeout (3300 s) bounds
# the damage, but a hang detected by log silence can be cut short much
# earlier: fits print an epoch line every ~50 s, so >7 min of silence
# means the device call is stuck. This watchdog kills the ACTIVE python
# leaf of the queue's process tree (found by walking children of the
# queue bash PID — never by pattern, which could match other sessions),
# letting run_with_retry restart it; fit_model resumes from the last
# epoch checkpoint, so a killed attempt loses at most one epoch.
#
# Usage: bash scripts/stall_watchdog.sh <queue_bash_pid> <log_file> &
set -u
QPID=$1
LOG=$2
THRESHOLD=${3:-420}

descendant_pythons() {
  # BFS through the queue's process tree; print PIDs whose comm is python*.
  local frontier=("$QPID") next=() pid child
  for _ in 1 2 3 4; do
    next=()
    for pid in "${frontier[@]}"; do
      for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
        next+=("$child")
        case "$(ps -o comm= -p "$child" 2>/dev/null)" in
          python*) echo "$child" ;;
        esac
      done
    done
    [ "${#next[@]}" -eq 0 ] && break
    frontier=("${next[@]}")
  done
}

while kill -0 "$QPID" 2>/dev/null; do
  sleep 60
  now=$(date +%s)
  mtime=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
  age=$((now - mtime))
  if [ "$age" -gt "$THRESHOLD" ]; then
    pids=$(descendant_pythons)
    if [ -n "$pids" ]; then
      echo "[stall-watchdog] log silent ${age}s; killing: $pids" >> "$LOG"
      for p in $pids; do kill "$p" 2>/dev/null; done
      sleep 30
    fi
  fi
done
echo "[stall-watchdog] queue $QPID exited; watchdog done" >> "$LOG"
