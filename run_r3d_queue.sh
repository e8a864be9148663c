#!/bin/bash
# Round-3d TPU queue — chained after run_r3c_queue.sh:
# 1. ref-regime dense-vs-flat bench (r3c's attempt hit the benchmarks/
#    sys.path bug, fixed since).
# 2. block-bf16 convergence sanity: matched 3000-step fresh runs, f32 vs
#    DSAT_BLOCK_BF16=1, same data/seed — does the 2.3x step speedup
#    (BENCH_BLOCKBF16_r03) train equivalently?
# 3. bench.py re-run (the r3b final bench read 410 ms/step, ~9x slow —
#    transient contention suspected) + the block-bf16 headline bench.
#
#   nohup bash run_r3d_queue.sh <r3c_pid> > logs/r3d_queue.log 2>&1 &
set -u
PREV_PID=${1:?usage: run_r3d_queue.sh <r3c_queue_pid>}

echo "waiting on r3c queue pid $PREV_PID ($(date -u))"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
sleep 15

echo "=== ref-regime (30-100 var) dense-vs-flat bench ($(date -u)) ==="
timeout 3600 python benchmarks/bench_ref_regime.py --out BENCH_REF_REGIME.json
sleep 15

echo "=== bf16 convergence sanity: f32 control ($(date -u)) ==="
timeout 2400 python diffusion_training.py --train_steps 3000 \
  --train_size 3000 --test_size 500 --eval_every 1000 --ckpt_every 3000 \
  --train_dir runs_sanity --label bf16ctl_f32
sleep 15
echo "=== bf16 convergence sanity: block-bf16 ($(date -u)) ==="
timeout 2400 env DSAT_BLOCK_BF16=1 python diffusion_training.py \
  --train_steps 3000 --train_size 3000 --test_size 500 --eval_every 1000 \
  --ckpt_every 3000 --train_dir runs_sanity --label bf16ctl_bf16
sleep 15

echo "=== bench.py re-run, f32 default ($(date -u)) ==="
timeout 2400 python bench.py | tee BENCH_SELF_r03c.json
sleep 15
echo "=== bench.py block-bf16 ($(date -u)) ==="
timeout 2400 env DSAT_BLOCK_BF16=1 python bench.py | tee BENCH_BF16_r03.json

echo "=== r3d queue complete ($(date -u)) ==="
