#!/bin/bash
# Round-5 hardware validation sweep — the full queue this repo's r4
# sessions converged on. ONE TPU process at a time (concurrent clients
# wreck timings and can wedge the relay); every step is timeout-bounded
# and logs to bench_logs/$TAG so a dead relay or slow-compile regime
# can never wedge the session. Usage:
#   bash scripts/hw_session_r5.sh [tag]      # default tag r5
# Check progress: cat bench_logs/$TAG/queue.log
set -u
cd "$(dirname "$0")/.."
TAG="${1:-r5}"
mkdir -p "bench_logs/$TAG"
Q="bench_logs/$TAG/queue.log"

run() {
  echo "=== $1 start $(date +%H:%M:%S) ===" >> "$Q"
  timeout "$2" bash -c "$3" > "bench_logs/$TAG/$1.log" 2>&1
  echo "=== $1 rc=$? end $(date +%H:%M:%S) ===" >> "$Q"
}

# official record first (first-light banks a number within minutes even
# in the slow-compile regime; budget-gated phases; MXU-probe key,
# normalized keys, adaptive-clustered + 4.4M big-shard phases)
run bench_official 3300 "python bench.py"
# r5 deep-k tail stage probes (floor attribution at the tuned config)
run probe_tail 2400 "python scripts/probe_tail_r5.py"
# device-time small-batch verdict for the sketch/adaptive tiers
# (chained fori_loop subtracts the relay RTT floor — VERDICT r4 item 4)
run device_time_smallbatch 3000 "python scripts/bench_device_time_smallbatch.py"
# sequence-packed encode A/B vs the bucketed path (VERDICT r4 item 5)
run encode_pack 2400 "python scripts/bench_encode_e2e.py --pack"
# packed row-length sweep (S=256 was the r5 winner; chip-state check)
run pack_seqlen 2400 "python scripts/probe_pack_seqlen.py"
# 4.4M-row shard phase standalone (also inside bench.py; this isolates it)
run big_shard 2700 "python scripts/validate_big_shard.py"
# the flagship one-jit workload (lax.map sequential alphas — r4c 12.0k
# eff qps exact at k=100 over 1.1M)
run fused_sweep 2400 "python scripts/bench_fused_sweep.py"
# adaptive probed-exact on the clustered-corpus workload it exists for
run adaptive 2700 "python scripts/bench_adaptive.py"
# guaranteed-mode routing, both index dtypes (bf16 sketch sidecars)
run guaranteed_quick 1800 "python scripts/bench_guaranteed.py --quick"
run guaranteed_quick_int8 1800 "python scripts/bench_guaranteed.py --quick --dtype int8"
# small-batch serving regime (the sketch tier's amortization sweet spot)
run guaranteed_b64 2700 "python scripts/bench_guaranteed.py --b 64 --iters 8"
run sketch_b64 1800 "python scripts/bench_sketch.py --b 64"
# online mutation steady-state
run mutation 1200 "python scripts/bench_mutation.py"
# encode e2e A/B: bf16 transfer downcast vs f32 (run with an idle host —
# concurrent pytest steals the tokenizer threads and pollutes the walls)
run encode_e2e 1500 "python scripts/bench_encode_e2e.py"
run encode_e2e_f32rb 1500 "python scripts/bench_encode_e2e.py --readback float32"
run encode_e2e_q8 1800 "python scripts/bench_encode_e2e.py --weight_quant int8"
# two-stage ColBERT serving (memmap + device-resident paths)
run rerank 1800 "python scripts/bench_rerank_tpu.py"
echo ALLDONE >> "$Q"
