#!/bin/bash
# Snapshot a run checkpoint role into the tracked artifacts/ directory and
# commit it, so model weights survive container resets between rounds
# (the round-2 20-block bootstrap checkpoint was lost exactly this way:
# experiments/*_out/ is gitignored and the machine is recycled between
# rounds).
#
# Usage: tools/snapshot_ckpt.sh <ckpt_dir>/<role> <artifact-name> [msg]
set -eu
SRC=$1; NAME=$2; MSG=${3:-"artifacts: snapshot $NAME"}
case "$NAME" in
  */*|*..*|"")  # a name like '..' would make the rm -rf escape artifacts/
    echo "invalid artifact name '$NAME' (no '/', '..', or empty)" >&2
    exit 2;;
esac
REPO=$(cd "$(dirname "$0")/.." && pwd)
DST="$REPO/artifacts/$NAME"
[ -d "$SRC" ] || { echo "no checkpoint at $SRC" >&2; exit 1; }
rm -rf "$DST"
cp -r "$SRC" "$DST"
cd "$REPO"
git add -f "artifacts/$NAME"
if git diff --cached --quiet -- "artifacts/$NAME"; then
  echo "snapshot: $SRC -> artifacts/$NAME (unchanged, nothing to commit)"
elif git commit -q -m "$MSG" -- "artifacts/$NAME"; then
  echo "snapshot: $SRC -> artifacts/$NAME (committed)"
else
  # do NOT mask a failed commit as success: this script exists precisely
  # to guarantee the weights are in git history
  echo "snapshot: git commit FAILED for artifacts/$NAME" >&2
  exit 1
fi
