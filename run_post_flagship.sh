#!/bin/bash
# Post-flagship TPU queue: waits for the training watchdog to exit, then
# runs the evaluation battery sequentially (one TPU process at a time).
WATCH_PID=${1:?usage: run_post_flagship.sh <watchdog_pid>}
CKPT=runs_flagship/query_sat_3-sat_flagship167k_20260817_071001/ckpt

echo "waiting on watchdog pid $WATCH_PID"
while kill -0 "$WATCH_PID" 2>/dev/null; do sleep 30; done
echo "=== flagship done ($(date -u)); starting eval battery ==="

echo "=== 1. bench.py ==="
timeout 1800 python bench.py | tee BENCH_SELF_r02.json

echo "=== 2. uniformity benchmark (the headline) ==="
timeout 7200 python uniformity_benchmark.py --model_ckpt "$CKPT" \
  --n_formulas 8 --k 10 --out benchmarks_flagship.jsonl \
  --summary_out UNIFORMITY_SUMMARY.json

echo "=== 2b. uniformity at 128 diffusion steps (best-uniformity config) ==="
timeout 3600 python uniformity_benchmark.py --model_ckpt "$CKPT" \
  --n_formulas 8 --k 10 --diffusion_steps 128 \
  --out benchmarks_flagship_ds128.jsonl \
  --summary_out UNIFORMITY_SUMMARY_DS128.json

echo "=== 3. ANFSAT at reference difficulty (17 rounds, 2-20 free bits) ==="
timeout 7200 python anf_training.py --rounds 17 --train_size 2000 \
  --test_size 200 --train_steps 4000 --eval_every 500 --label ref_difficulty

echo "=== 4. round-generalization sweep to 4096 ==="
timeout 5400 python main.py --restore "$CKPT" --train_steps 0 \
  --test_size 2000 --evaluate_round_gen --label roundgen \
  --train_dir runs_eval

echo "=== 5. 60k-budget dense bench ==="
timeout 1800 python benchmarks/bench_dense.py --dense --budget 60000 \
  --precision default | tee BENCH_60K.json

echo "=== post-flagship battery complete ($(date -u)) ==="
