#!/bin/bash
# Round-4 session-B hardware queue: re-run everything the bin-major
# Mosaic lane-legality bug (fixed at 7574d4a) crashed in r4s3, ending
# with the official bench. STRICTLY sequential (one TPU process at a
# time — see hw_session_r4.sh).
#
# Usage: bash scripts/hw_session_r4b.sh [logdir]   (default bench_logs/r4b)
cd /root/repo || exit 1
LOG=${1:-bench_logs/r4b}
mkdir -p "$LOG"

run() {
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date)) ==="
  timeout "$to" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- rc=$rc $name; tail:"
  tail -12 "$LOG/$name.log"
  return $rc
}

run guaranteed_quick 2400 python scripts/bench_guaranteed.py --quick || exit 1
run guaranteed_full  5400 python scripts/bench_guaranteed.py
run guaranteed_int8  5400 python scripts/bench_guaranteed.py --dtype int8
run mutation         3600 python scripts/bench_mutation.py
run fused_sweep      5400 python scripts/bench_fused_sweep.py
run bench_official   5400 python bench.py
echo "=== DONE ($(date)) — logs in $LOG ==="
