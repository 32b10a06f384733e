#!/bin/bash
# Round-4 hardware campaign: run the moment the axon tunnel is up.
# Stages in VERDICT-priority order, each logged + fault-isolated so a
# mid-campaign tunnel drop still leaves the earlier artifacts on disk.
#
#   1. official bench          -> BENCH_LKG.json updated (VERDICT item 2)
#   2. cluster stage costs     -> the round's decision point (item 1)
#   3. knob matrix sweep       -> defaults known-optimal (item 7)
#   4. convergence multi-scene -> time-to-quality table (item 4)
#   5. parity gallery          -> all defined cases (item 5)
#
# Usage: bash tools/campaign_r4.sh [logdir]   (default /tmp/campaign_r4)
set -u
export PYTHONUNBUFFERED=1  # stage logs survive a mid-run tunnel drop
LOG=${1:-/tmp/campaign_r4}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  ( "$@" ) > "$LOG/$name.out" 2> "$LOG/$name.err"
  echo "--- $name rc=$? (tail) ---"
  tail -5 "$LOG/$name.out"
}

run bench          timeout 2400 python bench.py
run cluster        timeout 2400 python tools/measure_cluster.py
run sweep_knobs    timeout 3600 python tools/sweep_knobs.py
run convergence    timeout 5400 python tools/measure_convergence.py
run parity         timeout 10800 env RT_PARITY_SPP=256 python tools/parity.py

echo "campaign done; logs in $LOG"
