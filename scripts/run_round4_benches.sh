#!/bin/bash
# Round-4 measurement sweep on the real TPU chip (one process at a time).
# Appends each bench's JSON line to the log; failures don't stop the sweep.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round4_benches.log}
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 python "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}
run scripts/bench_simulation.py
run scripts/bench_simulation.py --wf-mode brick
run scripts/bench_simulation.py --no-wavefront
run scripts/bench_polarized.py
run scripts/bench_gradient.py
run scripts/bench_gradient_sim.py --path simulation
run scripts/bench_gradient_sim.py --path polarized
run scripts/bench_simulation.py --freqs 10
run scripts/bench_adaptive.py
run scripts/bench_adaptive.py
echo "ALL DONE" >> "$LOG"
