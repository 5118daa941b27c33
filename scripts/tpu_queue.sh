#!/bin/bash
# Resilient sequential TPU runner for the hardware validation queue.
#
# The tunneled TPU backend tolerates exactly ONE client process at a time
# (concurrent processes trigger remote-compiler grant timeouts with
# ~25-minute recovery compiles — BENCH.md "methodology facts"), and the
# tunnel itself comes and goes.  This wrapper waits for a device, runs each
# step once under a timeout, and re-waits + retries a step when the backend
# dies mid-run.
#
# Usage:
#   scripts/tpu_queue.sh out_dir step1.py [step2.py ...]
# Each step's stdout/stderr goes to out_dir/<basename>.log with rc markers.
set -u
OUT=${1:?usage: tpu_queue.sh out_dir step.py...}; shift
mkdir -p "$OUT"
export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd):${PYTHONPATH:-}"

wait_tpu() {
  while true; do
    out=$(timeout 420 python -c "
import jax
try:
    print('PLATFORM=' + jax.devices()[0].platform)
except Exception as e:
    print('ERR', type(e).__name__)
" 2>/dev/null | grep '^PLATFORM=')
    case "$out" in PLATFORM=axon|PLATFORM=tpu) echo "TPU up $(date +%H:%M:%S)"; return 0;; esac
    echo "tpu down ($(date +%H:%M:%S)): ${out:-no-response}"
    sleep 120
  done
}

for step in "$@"; do
  name=$(basename "$step" .py)
  for attempt in 1 2; do
    wait_tpu
    echo "=== $name attempt $attempt $(date +%H:%M:%S)" >> "$OUT/$name.log"
    timeout 2400 python "$step" >> "$OUT/$name.log" 2>&1
    rc=$?
    echo "=== $name rc=$rc" >> "$OUT/$name.log"
    [ $rc -eq 0 ] && break
    sleep 60
  done
done
echo "QUEUE DONE $(date)"
