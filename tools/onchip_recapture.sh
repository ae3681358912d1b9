#!/bin/bash
# On-chip evidence recapture queue — run after TPU tunnel recovery.
# Each step appends to /tmp/onchip_recapture.log; run from /root/repo
# (axon plugin breaks under PYTHONPATH from other dirs, CLAUDE.md).
# Usage: bash tools/onchip_recapture.sh   (takes ~20 min; run in background)
set -x
cd /root/repo || exit 1
log=/tmp/onchip_recapture.log
echo "=== recapture start $(date +%F\ %T)" >> "$log"

echo "--- tpu_sweep fast (incl. mega-smoke: Mosaic lowering of the new leaf kinds)" >> "$log"
timeout 2400 python tools/tpu_sweep.py fast >> "$log" 2>&1
echo "tpu_sweep exit: $?" >> "$log"

echo "--- bench.py (driver contract line)" >> "$log"
timeout 2400 python bench.py >> "$log" 2>&1
echo "bench exit: $?" >> "$log"

echo "=== recapture end $(date +%F\ %T)" >> "$log"
