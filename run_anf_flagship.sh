#!/bin/bash
# ANF flagship run at reference difficulty (17 SHA-1 rounds, 2-20 free
# bits, reference data/sha_anf.py:24-27): 160k cosine-decay steps on 8000
# instances, with restart-on-failure (resume from the newest checkpoint,
# max 20 restarts) and a hard wall-clock deadline so the TPU is always
# released before the round's final bench.
#
#   DEADLINE_S=21600 nohup bash run_anf_flagship.sh > runs_anf/flagship.log 2>&1 &
set -u
STEPS=${STEPS:-160000}
DEADLINE_S=${DEADLINE_S:-21600}
CKPT=${CKPT:-}
START=$(date +%s)
for i in $(seq 1 20); do
  left=$((DEADLINE_S - ($(date +%s) - START)))
  if [ "$left" -le 120 ]; then
    echo "=== deadline reached; stopping ($(date -u)) ==="
    break
  fi
  echo "=== anf flagship attempt $i, ${left}s left ($(date -u)) ==="
  args=(--rounds 17 --train_size 8000 --test_size 256
        --train_steps "$STEPS" --eval_every 2000
        --cosine --label flagship160k --train_dir runs_anf)
  if [ -n "$CKPT" ]; then args+=(--restore "$CKPT"); fi
  timeout "$left" python anf_training.py "${args[@]}"
  code=$?
  if [ $code -eq 0 ]; then
    echo "=== anf flagship finished cleanly ($(date -u)) ==="
    break
  fi
  # first attempt creates the run dir; later attempts must resume it
  if [ -z "$CKPT" ]; then
    CKPT=$(ls -dt runs_anf/anf_sat_r17_flagship160k_*/ckpt 2>/dev/null | head -1)
  fi
  echo "=== exited with $code; restarting from $CKPT ==="
  sleep 10
done
