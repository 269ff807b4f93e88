#!/bin/bash
# Round-4 phase-3 sweep: tuned fused kernel, true-color via kernel,
# adaptive cold/warm with the persistent compile cache, formula re-check.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round4_benches3.log}
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 python "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}
run scripts/bench_simulation.py --kernel
run scripts/bench_simulation.py --kernel --freqs 10
run scripts/bench_adaptive.py
run scripts/bench_adaptive.py
run bench.py
echo "ALL DONE" >> "$LOG"
