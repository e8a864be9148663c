#!/bin/bash
# Stage 3 of the round-2 continuation queue: the reference's remaining
# eval modes (main.py:172-233 analogs) on the multi-label flagship, plus
# a real TPE hyperopt study on hardware (train/tpe.py was previously
# validated on CPU tests only).
#
#   nohup bash run_ml_tail3.sh <stage2_pid> > ml_tail3.log 2>&1 &
set -u
PREV_PID=${1:?usage: run_ml_tail3.sh <stage2_pid>}

echo "waiting on stage-2 pid $PREV_PID ($(date -u))"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
sleep 15

ML_CKPT=$(ls -dt runs_flagship/query_sat_3-sat_ml167k_*/ckpt 2>/dev/null | head -1)
if [ -n "$ML_CKPT" ]; then
  echo "=== round-gen sweep (16..4096) on ML flagship ($(date -u)) ==="
  timeout 4500 python main.py --restore "$ML_CKPT" --train_steps 0 \
    --test_size 2000 --evaluate_round_gen --label ml_roundgen \
    --train_dir runs_eval
  sleep 15

  echo "=== variable-gen sweep on ML flagship ($(date -u)) ==="
  timeout 4500 python main.py --restore "$ML_CKPT" --train_steps 0 \
    --test_size 200 --evaluate_variable_gen --label ml_vargen \
    --train_dir runs_eval
  sleep 15

  echo "=== batch-size-gen sweep on ML flagship ($(date -u)) ==="
  timeout 4500 python main.py --restore "$ML_CKPT" --train_steps 0 \
    --test_size 200 --evaluate_batch_gen --label ml_batchgen \
    --train_dir runs_eval
  sleep 15

  echo "=== invariance test on ML flagship ($(date -u)) ==="
  timeout 2400 python main.py --restore "$ML_CKPT" --train_steps 0 \
    --test_size 200 --test_invariance --label ml_invariance \
    --train_dir runs_eval
  sleep 15
fi

echo "=== TPE hyperopt study on hardware ($(date -u)) ==="
timeout 7200 python hyperopt.py --trials 12 --steps_per_trial 1500 \
  --out HYPEROPT_TPU.jsonl

echo "=== stage-3 queue complete ($(date -u)) ==="
