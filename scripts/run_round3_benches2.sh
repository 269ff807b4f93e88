#!/bin/bash
# Round-3 phase-2 sweep: wavefront A/B (brick vs dedup vs per-step) and the
# adaptive cold/warm timing with the persistent compile cache.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/round3_benches2.log}
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 1500 python "$@" >> "$LOG" 2>&1
  echo "--- exit $? ---" >> "$LOG"
}
run scripts/bench_simulation.py --wf-mode brick
run scripts/bench_simulation.py --no-wavefront
run scripts/bench_adaptive.py
run scripts/bench_adaptive.py
echo "ALL DONE" >> "$LOG"
