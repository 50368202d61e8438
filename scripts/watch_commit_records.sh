#!/bin/bash
# Evidence watcher: every 3 min, git-commit any new/updated crossval or
# eval records under outputs/ (which is .gitignore'd — records must be
# force-added). Insurance against the environment resets that have
# twice deleted un-committed raw records (RESULTS.md provenance note).
# Run detached alongside a TPU queue:
#   setsid nohup bash scripts/watch_commit_records.sh > /tmp/watch.log 2>&1 &
#
# ADVICE-r3 fixes: globs expand via nullglob (a pattern with no matches
# no longer aborts the whole add), git stderr goes to the log, and the
# commit names an explicit pathspec (`-- outputs/`) so it only ever
# commits record files — anything the builder staged concurrently stays
# staged and untouched; conversely we never `git reset` the shared index.
cd /root/repo || exit 1
shopt -s nullglob
while true; do
  sleep 180
  records=(
    outputs/*.json
    outputs/*/*.json
    outputs/*/*.jsonl
    outputs/*/*/*.json
    outputs/*/*/checkpoints/soup-*/soup.json
    outputs/*/*/checkpoints/index.json
  )
  if [ "${#records[@]}" -eq 0 ]; then
    continue
  fi
  git add -f -- "${records[@]}" || echo "[watcher] git add failed"
  if ! git diff --cached --quiet -- outputs/; then
    if git commit -q -m "Auto-commit regenerated evaluation records (evidence watcher)

No-Verification-Needed: output records only, no code change" -- outputs/; then
      echo "[watcher] committed at $(date -u)"
    else
      echo "[watcher] commit failed at $(date -u)"
    fi
  fi
done
