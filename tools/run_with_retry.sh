#!/bin/bash
# Run a TPU experiment command with stall-retry.
#
# The axon tunnel drops or wedges client connections sporadically; a fresh
# process (fresh tunnel port) usually succeeds.  Usage:
#   tools/run_with_retry.sh <timeout_s> <progress_file> <tries> -- cmd args...
# Succeeds as soon as <progress_file> gains at least one new line compared
# to before the attempt; otherwise kills the attempt and retries.
set -u
TIMEOUT=$1; PROGRESS=$2; TRIES=$3; shift 3
[ "$1" = "--" ] && shift

lines() { [ -f "$PROGRESS" ] && wc -l < "$PROGRESS" || echo 0; }

for attempt in $(seq 1 "$TRIES"); do
  before=$(lines)
  echo "[retry-wrapper] attempt $attempt/$TRIES: $*" >&2
  timeout --kill-after=15 "$TIMEOUT" "$@"
  rc=$?
  after=$(lines)
  if [ "$after" -gt "$before" ]; then
    echo "[retry-wrapper] progress ($before -> $after lines), rc=$rc" >&2
    exit 0
  fi
  echo "[retry-wrapper] no progress (rc=$rc), retrying" >&2
done
echo "[retry-wrapper] giving up after $TRIES attempts" >&2
exit 1
