#!/bin/bash
# Round-2 tail TPU queue (sequential, one TPU process at a time):
# 1. latefreeze uniformity (the new best-tradeoff sampler regime)
# 2. ANFSAT at reference difficulty
# 3. round-generalization sweep to 4096
# 4. 60k-budget dense bench
CKPT=runs_flagship/query_sat_3-sat_flagship167k_20260817_071001/ckpt

echo "=== 1. latefreeze uniformity ($(date -u)) ==="
timeout 4500 python uniformity_benchmark.py --model_ckpt "$CKPT" \
  --n_formulas 8 --k 10 --variants diffusion_latefreeze \
  --out benchmarks_flagship_latefreeze.jsonl \
  --summary_out UNIFORMITY_SUMMARY_LATEFREEZE.json

echo "=== 2. ANFSAT at reference difficulty ($(date -u)) ==="
timeout 7200 python anf_training.py --rounds 17 --train_size 2000 \
  --test_size 200 --train_steps 4000 --eval_every 500 --label ref_difficulty

echo "=== 3. round-generalization sweep to 4096 ($(date -u)) ==="
timeout 4500 python main.py --restore "$CKPT" --train_steps 0 \
  --test_size 2000 --evaluate_round_gen --label roundgen \
  --train_dir runs_eval

echo "=== 4. 60k-budget dense bench ($(date -u)) ==="
timeout 1800 python benchmarks/bench_dense.py --dense --budget 60000 \
  --precision default | tee BENCH_60K.json

echo "=== round-2 tail queue complete ($(date -u)) ==="
