#!/bin/bash
# Round-5g queue — solve-rate depth + 60k training verification.
# Chained on run_r5f's marker.
# 1. Multi-try solve evals at tries=8 and tries=16 on the final k64
#    checkpoint (tries=4 already reads 95.4%; find the multi-try
#    ceiling — reference predict keeps first-solving semantics,
#    reference model/query_sat.py:426-445).
# 2. If the 60k bench won (BENCH_60K.json value > BENCH_r03 68.9 M
#    edges/s), a paired wall-clock-matched training check: 1500 steps
#    at the 60k budget vs 20k budget, same seed — VERDICT r3 item 2's
#    "one training-run verification that convergence per wall-clock
#    improves".
#
#   nohup bash run_r5g_queue.sh > logs/r5g_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2400); do
  grep -q 'r5f queue done' logs/r5f_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5f queue done' logs/r5f_queue.log 2>/dev/null; then
  echo "ABORT: r5f queue completion marker never appeared"; exit 1
fi
K64_CKPT=runs_flagship/query_sat_3-sat_mlk64_20260819_231652/ckpt

echo "=== solve eval tries=8 ($(date -u)) ==="
timeout 2700 python solve_eval.py --model_ckpt "$K64_CKPT" \
  --label_samples 64 --tries 8 --out SOLVE_EVAL_MLK64_T8.json
sleep 15
echo "=== solve eval tries=16 ($(date -u)) ==="
timeout 3600 python solve_eval.py --model_ckpt "$K64_CKPT" \
  --label_samples 64 --tries 16 --out SOLVE_EVAL_MLK64_T16.json
sleep 15

won=$(python3 - <<'EOF'
import json
try:
    b60 = json.load(open('BENCH_60K.json'))
    print(1 if b60.get('value', 0) > 68.9 else 0)
except Exception:
    print(0)
EOF
)
if [ "$won" = "1" ]; then
  echo "=== 60k budget won; paired convergence check ($(date -u)) ==="
  timeout 3000 python diffusion_training.py --train_steps 1500 \
    --train_size 60000 --test_size 2000 --eval_every 500 --ckpt_every 1500 \
    --label conv20k --train_dir runs_sanity --max_nodes_per_batch 20000
  sleep 15
  timeout 3000 python diffusion_training.py --train_steps 1500 \
    --train_size 60000 --test_size 2000 --eval_every 500 --ckpt_every 1500 \
    --label conv60k --train_dir runs_sanity --max_nodes_per_batch 60000
  echo "compare runs_sanity/*conv20k*/train_log.jsonl vs *conv60k* (loss-vs-walltime)"
else
  echo "60k budget did not beat BENCH_r03; skipping convergence check"
fi
echo "=== r5g queue done ($(date -u)) ==="
