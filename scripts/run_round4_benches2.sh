#!/bin/bash
# Round-4 phase-2 sweep: Pallas probe, the fused simulation kernel, and
# per-step A/B baselines, on the real TPU chip (one process at a time).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round4_benches2.log}
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 python "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}
run scripts/bench_pallas_probe.py
run scripts/bench_simulation.py --freqs 10 --no-kernel --no-wavefront
echo "ALL DONE" >> "$LOG"
