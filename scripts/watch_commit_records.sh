#!/bin/bash
# Evidence watcher: every 3 min, git-commit any new/updated crossval or
# eval records under outputs/ (which is .gitignore'd — records must be
# force-added). Insurance against the environment resets that have
# twice deleted un-committed raw records (RESULTS.md provenance note).
# Run detached alongside a TPU queue:
#   setsid nohup bash scripts/watch_commit_records.sh > /tmp/watch.log 2>&1 &
cd /root/repo || exit 1
while true; do
  sleep 180
  git add -f outputs/*/crossval_*.json outputs/*/tta_eval.json \
    outputs/*/*.json 2>/dev/null
  # Only records: never sweep up source edits the builder is mid-way on.
  git reset -q -- ':!outputs' 2>/dev/null
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "Auto-commit regenerated evaluation records (evidence watcher)

No-Verification-Needed: output records only, no code change"
    echo "[watcher] committed at $(date -u)"
  fi
done
