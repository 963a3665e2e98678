#!/bin/bash
# Supervise experiments/bootstrap_run.py against tunnel wedges, the same
# way tools/supervise_finetune.sh guards the self-play loop: if neither
# progress.jsonl nor the event log advances within the live window, kill
# the attempt and relaunch with --resume (restores the latest checkpoint
# and continues after the last completed loop).
#
# Usage: tools/supervise_bootstrap.sh <out_dir> <total_loops> [extra args...]
set -u
OUT=$1; TOTAL=$2; shift 2
EXTRA=("$@")
LIVE_WINDOW=2400
PROGRESS="$OUT/progress.jsonl"
EVENTS="$OUT/log/events.jsonl"

loops_done() { [ -f "$PROGRESS" ] && wc -l < "$PROGRESS" || echo 0; }
last_write() {
  local t=0 f
  for f in "$PROGRESS" "$EVENTS"; do
    [ -f "$f" ] && { local m; m=$(stat -c %Y "$f"); [ "$m" -gt "$t" ] && t=$m; }
  done
  echo "$t"
}

attempt=0
fastfails=0
while :; do
  done_n=$(loops_done)
  [ "$done_n" -ge "$TOTAL" ] && { echo "[supervise] all $TOTAL loops done"; exit 0; }
  attempt=$((attempt + 1))
  RESUME=()
  [ "$done_n" -gt 0 ] && RESUME=(--resume)
  echo "[supervise] attempt $attempt: loops $done_n/$TOTAL," \
       "launching ${RESUME[*]:-fresh}" >&2
  python experiments/bootstrap_run.py --out "$OUT" --loops "$TOTAL" \
      "${RESUME[@]}" "${EXTRA[@]}" &
  PID=$!
  t0=$(date +%s)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s); lw=$(last_write)
    ref=$t0; [ "$lw" -gt "$ref" ] && ref=$lw
    if [ $((now - ref)) -gt "$LIVE_WINDOW" ]; then
      echo "[supervise] stalled $((now - ref))s — restarting" >&2
      kill -9 "$PID" 2>/dev/null; sleep 3; break
    fi
  done
  wait "$PID" 2>/dev/null
  # Fast-exit detection: a deterministic startup failure (bad flag, torn
  # state) would otherwise relaunch in a tight infinite loop.
  runtime=$(( $(date +%s) - t0 ))
  if [ "$runtime" -lt 120 ]; then
    fastfails=$((fastfails + 1))
    if [ "$fastfails" -ge 5 ]; then
      echo "[supervise] child died <120s five times in a row — aborting" >&2
      exit 1
    fi
  else
    fastfails=0
  fi
  sleep 10
done
