#!/bin/bash
# Supervise experiments/selfplay_finetune.py against tunnel wedges.
#
# Launches the finetune driver; if neither the per-iteration progress file
# nor the event log has been written recently (startup gets a longer
# grace for first-compile), kills the attempt and relaunches with
# --resume from the latest checkpoint + persisted replay.
#
# Usage: tools/supervise_finetune.sh <out_dir> <total_iters> [extra args...]
set -u
OUT=$1; TOTAL=$2; shift 2
EXTRA=("$@")
LIVE_WINDOW=2400     # max silence (since attempt start or last write)
                     # before restart: covers slow-link first compiles
PROGRESS="$OUT/progress.jsonl"
EVENTS="$OUT/log/events.jsonl"

iters_done() { [ -f "$PROGRESS" ] && wc -l < "$PROGRESS" || echo 0; }
accepted() {
  [ -f "$PROGRESS" ] && tail -1 "$PROGRESS" \
    | grep -o '"accepted_total": [0-9]*' | grep -o '[0-9]*' || echo 0
}
last_write() {  # newest mtime among progress/event logs, 0 if none
  local t=0 f
  for f in "$PROGRESS" "$EVENTS"; do
    [ -f "$f" ] && { local m; m=$(stat -c %Y "$f"); [ "$m" -gt "$t" ] && t=$m; }
  done
  echo "$t"
}

attempt=0
fastfails=0
while :; do
  done_n=$(iters_done)
  left=$((TOTAL - done_n))
  [ "$left" -le 0 ] && { echo "[supervise] all $TOTAL iters done"; exit 0; }
  attempt=$((attempt + 1))
  if [ "$done_n" -gt 0 ]; then
    RESUME=(--resume --start-iter "$done_n" --start-accepted "$(accepted)")
  else
    RESUME=()
  fi
  echo "[supervise] attempt $attempt: iters $done_n/$TOTAL," \
       "launching ${RESUME[*]:-fresh}" >&2
  python experiments/selfplay_finetune.py --out "$OUT" --iters "$left" \
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
