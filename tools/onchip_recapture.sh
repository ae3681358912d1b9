#!/bin/bash
# On-chip evidence recapture queue — run after TPU tunnel recovery.
# Each step appends to /tmp/onchip_recapture.log; run from /root/repo
# (axon plugin breaks under PYTHONPATH from other dirs, CLAUDE.md).
# Usage: bash tools/onchip_recapture.sh   (takes ~20 min; run in background)
set -x
cd /root/repo || exit 1
log=/tmp/onchip_recapture.log
echo "=== recapture start $(date +%F\ %T)" >> "$log"

# A transient tunnel FailedPrecondition poisons the whole process (seen
# 2026-08-18 right after a tunnel recovery: the same model passed in a
# fresh process) — retry each step once in a new process before believing
# a failure.
run_retry() {
  local label="$1"; shift
  echo "--- $label" >> "$log"
  timeout 2400 "$@" >> "$log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "$label exit: $rc — retrying once in a fresh process" >> "$log"
    sleep 10
    timeout 2400 "$@" >> "$log" 2>&1
    rc=$?
  fi
  echo "$label exit: $rc" >> "$log"
}

run_retry "tpu_sweep fast (incl. mega-smoke: Mosaic lowering of the new leaf kinds)" \
  python tools/tpu_sweep.py fast
run_retry "bench.py (driver contract line)" python bench.py

echo "=== recapture end $(date +%F\ %T)" >> "$log"
