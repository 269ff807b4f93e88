#!/bin/bash
# Round-3 measurement sweep on the real TPU chip (one process at a time).
# Appends each bench's JSON line to the log; failures don't stop the sweep.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round3_benches.log}
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 1500 python "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}
run scripts/bench_polarized.py
run scripts/bench_gradient_sim.py --path simulation
run scripts/bench_gradient_sim.py --path polarized
run scripts/bench_gradient.py
run scripts/bench_simulation.py --freqs 10
echo "ALL DONE" >> "$LOG"
