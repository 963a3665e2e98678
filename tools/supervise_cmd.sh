#!/bin/bash
# Generic stall-watchdog for TPU commands (axon tunnel wedges: an RPC can
# hang forever while the chip sits idle; a fresh process usually works).
# Relaunches <cmd> whenever <watch_file> goes stale for <live_window>
# seconds while the process is running; exits when <cmd> exits 0.
#
# Usage: tools/supervise_cmd.sh <live_window_s> <watch_file> <max_attempts> -- cmd args...
set -u
WINDOW=$1; WATCH=$2; TRIES=$3; shift 3
[ "$1" = "--" ] && shift

mtime() { [ -f "$WATCH" ] && stat -c %Y "$WATCH" || echo 0; }

for attempt in $(seq 1 "$TRIES"); do
  echo "[supervise-cmd] attempt $attempt/$TRIES: $*" >&2
  "$@" &
  PID=$!
  t0=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    now=$(date +%s); lw=$(mtime); ref=$t0
    [ "$lw" -gt "$ref" ] && ref=$lw
    if [ $((now - ref)) -gt "$WINDOW" ]; then
      echo "[supervise-cmd] stalled $((now - ref))s — killing" >&2
      kill "$PID" 2>/dev/null; sleep 5
      kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID"; rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[supervise-cmd] done rc=0 after attempt $attempt" >&2
    exit 0
  fi
  echo "[supervise-cmd] attempt $attempt exited rc=$rc" >&2
  sleep 5
done
echo "[supervise-cmd] giving up after $TRIES attempts" >&2
exit 1
