#!/bin/bash
# Flagship 167k-step run with restart-on-failure (failure recovery:
# resume from the newest checkpoint after a crash/OOM, max 20 restarts).
CKPT=${CKPT:-runs_flagship/query_sat_3-sat_flagship167k_20260817_071001/ckpt}
for i in $(seq 1 20); do
  echo "=== flagship attempt $i ($(date -u)) ==="
  python diffusion_training.py \
    --train_steps 167000 --train_size 100000 \
    --eval_every 1000 --ckpt_every 1000 \
    --incidence_precision default \
    --label flagship167k_resume --train_dir runs_flagship \
    --restore "$CKPT"
  code=$?
  if [ $code -eq 0 ]; then
    echo "=== flagship finished cleanly ==="
    break
  fi
  echo "=== exited with $code; restarting from latest checkpoint ==="
  sleep 10
done
