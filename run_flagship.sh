#!/bin/bash
# Flagship 167k-step diffusion run (reference schedule, config.py:24) with
# restart-on-failure and a hard wall-clock deadline so the TPU is released
# before the round's final bench.
#
#   DEADLINE_S=14400 nohup bash run_flagship.sh > runs_flagship/flagship.log 2>&1 &
#
# Fresh start by default; set CKPT=<dir> to resume an existing run.
set -u
STEPS=${STEPS:-167000}
TRAIN_SIZE=${TRAIN_SIZE:-60000}
DEADLINE_S=${DEADLINE_S:-14400}
CKPT=${CKPT:-}
START=$(date +%s)
for i in $(seq 1 20); do
  left=$((DEADLINE_S - ($(date +%s) - START)))
  if [ "$left" -le 120 ]; then
    echo "=== deadline reached; stopping ($(date -u)) ==="
    break
  fi
  echo "=== flagship attempt $i, ${left}s left ($(date -u)) ==="
  args=(--train_steps "$STEPS" --train_size "$TRAIN_SIZE"
        --test_size 2000
        --eval_every 1000 --ckpt_every 1000
        --incidence_precision default
        --label flagship167k --train_dir runs_flagship)
  if [ -n "$CKPT" ]; then args+=(--restore "$CKPT"); fi
  timeout "$left" python diffusion_training.py "${args[@]}"
  code=$?
  if [ $code -eq 0 ]; then
    echo "=== flagship finished cleanly ($(date -u)) ==="
    break
  fi
  if [ -z "$CKPT" ]; then
    CKPT=$(ls -dt runs_flagship/query_sat_3-sat_flagship167k_*/ckpt 2>/dev/null | head -1)
  fi
  echo "=== exited with $code; restarting from $CKPT ==="
  sleep 10
done
