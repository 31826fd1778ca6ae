#!/usr/bin/env bash
# Retry wrapper around evaluation — parity with
# code/scripts/run_evaluation_failsafe.sh:1-124.
set -u

[ $# -lt 1 ] && { echo "usage: $0 <conf> [eval args...]"; exit 1; }
CONF=$1; shift

MAX_RETRIES=${MAX_RETRIES:-0}
attempt=0
while :; do
  python -m hashmodnffbanks_idr_tpu.eval.run_eval --conf "$CONF" "$@"
  rc=$?
  [ $rc -eq 0 ] && exit 0
  attempt=$((attempt + 1))
  echo "evaluation exited rc=$rc — retrying (attempt $attempt)"
  if [ "$MAX_RETRIES" -gt 0 ] && [ $attempt -ge "$MAX_RETRIES" ]; then
    exit $rc
  fi
  sleep 5
done
