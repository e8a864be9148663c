#!/bin/bash
# Round-2 final-session TPU queue (sequential, one TPU process at a time):
# 1. rebuild the 3-SAT dataset cache (jax-free, ~2 min on a fresh machine)
# 2. definitive pinned-noise solve_eval on the committed round-2 single-label
#    flagship npz -> SOLVE_EVAL_SL.json (round-1 headline metric, reproduced
#    from the portable checkpoint alone)
# 3. LIVE end-to-end uniformity battery with the XOR-cell-jump refiner
#    (XOR_JUMP_STUDY.json was offline on recorded end-states; this runs the
#    full diffusion -> MH -> XOR-jump stack fresh on TPU) plus the paired
#    nofreeze reading on the same checkpoint/formulas
# 4. final bench reading
#
#   nohup bash run_session_queue.sh > session_queue.log 2>&1 &
set -u
cd /root/repo

echo "=== build 3-SAT cache ($(date -u)) ==="
timeout 900 env DSAT_FORCE_CPU=1 python build_3sat_cache.py

sleep 5
echo "=== solve_eval: round-2 single-label flagship npz ($(date -u)) ==="
timeout 1800 python solve_eval.py \
  --model_ckpt pretrained/query_sat_3sat_diffusion.npz \
  --out SOLVE_EVAL_SL.json

sleep 15
echo "=== live XOR-jump + nofreeze battery ($(date -u)) ==="
timeout 2100 python uniformity_benchmark.py \
  --model_ckpt pretrained/query_sat_3sat_diffusion.npz \
  --n_formulas 8 --k 10 \
  --variants uniform,diffusion_nofreeze,diffusion_mh_xor,walksat_mh_xor \
  --out benchmarks_live_xor.jsonl \
  --summary_out UNIFORMITY_SUMMARY_LIVE_XOR.json

sleep 15
echo "=== final bench ($(date -u)) ==="
timeout 1500 python bench.py

echo "=== session queue complete ($(date -u)) ==="
