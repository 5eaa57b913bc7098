#!/bin/bash
# Round-4 consolidated hardware session: run the moment the axon relay
# answers (VERDICT r3 items 2/3/7). STRICTLY sequential — never two TPU
# processes (wrecks timings, can wedge the relay) — with generous
# timeouts (remote compiles take 1-10 min each) and per-phase logs.
#
# Usage: bash scripts/hw_session_r4.sh [logdir]   (default bench_logs/r4)
cd /root/repo || exit 1
LOG=${1:-bench_logs/r4}
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

# fail fast if the relay went away again: the quick phases double as probes
run sketch_quick     2400 python scripts/bench_sketch.py --quick || exit 1
run guaranteed_quick 2400 python scripts/bench_guaranteed.py --quick || exit 1
run guaranteed_quick_int8 2400 python scripts/bench_guaranteed.py --quick --dtype int8 || exit 1
# the full measurements (VERDICT items 2 + 3)
run sketch_full      5400 python scripts/bench_sketch.py
run guaranteed_full  5400 python scripts/bench_guaranteed.py
run guaranteed_int8  5400 python scripts/bench_guaranteed.py --dtype int8
run mutation         3600 python scripts/bench_mutation.py
run fused_sweep      5400 python scripts/bench_fused_sweep.py
# encode e2e overlap profile (item 7) + weight-quant A/B
run encode_e2e       3600 python scripts/bench_encode_e2e.py
run encode_e2e_q8    3600 python scripts/bench_encode_e2e.py --weight_quant int8
# official bench last so its JSON reflects a warm, healthy relay
run bench_official   5400 python bench.py
echo "=== DONE ($(date)) — logs in $LOG ==="
