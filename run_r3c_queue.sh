#!/bin/bash
# Round-3c TPU queue — perf studies chained after run_r3b_queue.sh:
# 1. Reference-default regime (30-100 vars) dense-vs-flat crossover
#    bench -> BENCH_REF_REGIME.json (VERDICT round-2 weak #2); informs
#    the DSAT_DENSE_MAX_VARS hybrid-dispatch default.
# 2. Block-level bf16 ablation on the dense 20k workload (VERDICT #9):
#    f32 default vs --block_bf16, same mixed batch.
# 3. Measured TF2-reference baseline on a QUIET host (the first run
#    raced the forced-CPU verify training; CPU timings were contended).
#
#   nohup bash run_r3c_queue.sh <r3b_pid> > logs/r3c_queue.log 2>&1 &
set -u
PREV_PID=${1:?usage: run_r3c_queue.sh <r3b_queue_pid>}

echo "waiting on r3b queue pid $PREV_PID ($(date -u))"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
sleep 15

echo "=== ref-regime (30-100 var) dense-vs-flat bench ($(date -u)) ==="
timeout 3600 python benchmarks/bench_ref_regime.py --out BENCH_REF_REGIME.json
sleep 15

echo "=== block-bf16 ablation, dense 20k workload ($(date -u)) ==="
timeout 2400 python benchmarks/bench_dense.py --dense --precision default \
  | tee BENCH_BLOCKBF16_r03.json
timeout 2400 python benchmarks/bench_dense.py --dense --precision default \
  --block_bf16 | tee -a BENCH_BLOCKBF16_r03.json
sleep 15

echo "=== TF-reference baseline, quiet host (CPU) ($(date -u)) ==="
timeout 5400 env JAX_PLATFORM_NAME=cpu python benchmarks/bench_tf_reference.py \
  --out BENCH_TF_REF.json

echo "=== r3c queue complete ($(date -u)) ==="
