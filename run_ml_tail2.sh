#!/bin/bash
# Stage 2 of the round-2 continuation queue: definitive pinned-noise
# solving evals on the full held-out split, after run_ml_tail.sh drains.
# Both checkpoints are evaluated on the SAME test formulas (the _k16
# cache split; labels differ between cache variants but the formulas and
# the solved metric do not depend on them).
#
#   nohup bash run_ml_tail2.sh <run_ml_tail_pid> > ml_tail2.log 2>&1 &
set -u
TAIL_PID=${1:?usage: run_ml_tail2.sh <run_ml_tail_pid>}

echo "waiting on tail-queue pid $TAIL_PID ($(date -u))"
while kill -0 "$TAIL_PID" 2>/dev/null; do sleep 60; done
sleep 15

echo "=== solve_eval: multi-label flagship ($(date -u)) ==="
ML_CKPT=$(ls -dt runs_flagship/query_sat_3-sat_ml167k_*/ckpt 2>/dev/null | head -1)
if [ -n "$ML_CKPT" ]; then
  timeout 3600 python solve_eval.py --model_ckpt "$ML_CKPT" \
    --label_samples 16 --out SOLVE_EVAL_ML.json
fi
sleep 15

echo "=== solve_eval: round-2 single-label flagship (same formulas) ==="
timeout 3600 python solve_eval.py \
  --model_ckpt pretrained/query_sat_3sat_diffusion.npz \
  --label_samples 16 --out SOLVE_EVAL_SL.json

echo "=== stage-2 queue complete ($(date -u)) ==="
