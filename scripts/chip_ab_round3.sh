#!/bin/bash
# Round-3 on-chip A/B plan: run this the moment a TPU attaches.
#
# Produces JSON-line logs under /tmp/ab_r3/ answering, in priority order:
#   1. per-block: does the flat-lane kernel beat the round-2 fused kernel
#      on the k5 blocks (the v1 transposed kernel lost them) and by how
#      much on the rest?                       -> blocks_512.jsonl
#   2. end-to-end: which engine config wins the headline bench?
#      (fused/fused vs flat routed vs flat-all) -> e2e.jsonl
#   3. latency: single-pair 256px with the best config vs the 5 ms target
#                                               -> latency.jsonl
#   4. training: step throughput, conv vs shifts depthwise lowering
#                                               -> train.jsonl
#
# Every python run is bounded with a generous `timeout` (NEVER kill a
# process holding the TPU mid-op — a mid-op SIGTERM wedged the tunnel
# permanently once already; timeouts here are sized so they only fire if
# the run is already hung).
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
OUT=/tmp/ab_r3
mkdir -p "$OUT"

run() {  # run <logname> <timeout-s> <cmd...>
  local log="$OUT/$1"; shift
  local t="$1"; shift
  echo "=== $(date +%H:%M:%S) $*" | tee -a "$log"
  timeout "$t" "$@" 2>&1 | tee -a "$log"
  echo "--- rc=$? $(date +%H:%M:%S)" | tee -a "$log"
}

# 0. tunnel sanity (fast fail if still down)
if ! timeout 120 python -c "import jax.numpy as jnp; print(float(jnp.ones((2,2)).sum()))"; then
  echo "TUNNEL STILL DOWN"; exit 1
fi

# 1. autotune: time EVERY block instance at 512px across xla/fused/flat
#    and write the policy table the engine's "auto" mode consults.
run autotune.jsonl 7200 python -u scripts/autotune_blocks.py --iters 20 \
    --out arbitrarystyletransfer_tpu/ops/pallas/tuned_policy.json

# 2. end-to-end engine configs (headline bench shape)
run e2e.jsonl 1800 python -u bench.py --iters 10 --no-with_latency
run e2e.jsonl 2400 python -u bench.py --iters 10 --no-with_latency \
    --decoder auto --encoder auto
run e2e.jsonl 1800 python -u bench.py --iters 10 --no-with_latency \
    --decoder flat --encoder flat
run e2e.jsonl 2400 python -u bench.py --iters 10 --no-with_latency \
    --decoder flat-all --encoder flat-all

# 3. latency at 256 / 320 with the default, the flat tail, and auto
for dec in fused flat auto; do
  run latency.jsonl 1200 python -u bench.py --latency --size 256 \
      --decoder "$dec" --encoder "$dec"
  run latency.jsonl 1200 python -u bench.py --latency --size 320 \
      --decoder "$dec" --encoder "$dec"
done

# 4. training-step throughput (the AST step compiles in ~5-10 min remote):
#    A/B the depthwise lowering and the compute dtype.
run train.jsonl 3600 python -u bench.py --train ast --iters 5
run train.jsonl 3600 python -u bench.py --train ast --iters 5 --dw_impl shifts
run train.jsonl 3600 python -u bench.py --train ast --iters 5 \
    --dtype bfloat16
run train.jsonl 2400 python -u bench.py --train ae --iters 5
run train.jsonl 2400 python -u bench.py --train ae --iters 5 --dw_impl shifts

# 5. where does the remaining time go? per-op profile of the fused engine
run profile.log 1800 python -u scripts/profile_stylize.py --engine fused


echo "=== ALL DONE $(date +%H:%M:%S)"
