#!/usr/bin/env bash
# Derive the ScalaTest count from an actual suite run and sync it into
# README.md — the count is MEASURED, never hand-edited (r12 verdict nit:
# the README drifted one test behind the suite). Usage:
#   scripts/sync_test_count.sh            # runs `sbt -batch test` itself
#   scripts/sync_test_count.sh <logfile>  # parses an existing run's log
set -euo pipefail
cd "$(dirname "$0")/.."

if [ $# -ge 1 ]; then
  LOG="$1"
else
  LOG=$(mktemp)
  sbt -batch test | tee "$LOG"
fi

# ScalaTest summary line: "Tests: succeeded N, failed 0, ..."
N=$(grep -Eo 'Tests: succeeded [0-9]+' "$LOG" | tail -1 | grep -Eo '[0-9]+')
FAILED=$(grep -Eo 'failed [0-9]+' "$LOG" | tail -1 | grep -Eo '[0-9]+')
if [ -z "$N" ]; then
  echo "sync_test_count: no ScalaTest summary found in $LOG" >&2
  exit 1
fi
if [ "${FAILED:-1}" != "0" ]; then
  echo "sync_test_count: suite not green (failed=$FAILED); refusing to sync" >&2
  exit 1
fi

sed -i -E "s/# [0-9]+ ScalaTests/# $N ScalaTests/" README.md
echo "README.md test count synced to $N"
