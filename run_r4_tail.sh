#!/bin/bash
# Round-4 tail — the reference eval modes never yet run on hardware
# (main.py:172-233 analogs) against the completed ML-167k flagship
# (full TrainState restored from the committed resume tarball):
# variable-size generalization, permutation invariance, batch-size
# generalization. Chained behind the r4 queue (one TPU client at a
# time).
#
#   nohup bash run_r4_tail.sh <r4_queue_pid> > logs/r4_tail.log 2>&1 &
set -u
cd /root/repo
PREV_PID=${1:?usage: run_r4_tail.sh <r4_queue_pid>}

echo "waiting on r4-queue pid $PREV_PID ($(date -u))"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
sleep 20

ML_CKPT=""
for d in $(ls -dt runs_flagship/query_sat_3-sat_ml167k_*/ckpt 2>/dev/null); do
  if ls "$d" 2>/dev/null | grep -qE '^[0-9]+$'; then ML_CKPT="$d"; break; fi
done
if [ -z "$ML_CKPT" ]; then
  echo "unpacking ml167k resume tarball"
  tar -xzf pretrained/ml167k_resume.tar.gz -C runs_flagship
  ML_CKPT=$(ls -dt runs_flagship/query_sat_3-sat_ml167k_*/ckpt 2>/dev/null | head -1)
fi
echo "ML ckpt: $ML_CKPT"

echo "=== variable-gen sweep on ML flagship ($(date -u)) ==="
timeout 2700 python main.py --restore "$ML_CKPT" --train_steps 0 \
  --test_size 200 --evaluate_variable_gen --label ml_vargen \
  --train_dir runs_eval
sleep 15

echo "=== invariance test on ML flagship ($(date -u)) ==="
timeout 1800 python main.py --restore "$ML_CKPT" --train_steps 0 \
  --test_size 200 --test_invariance --label ml_invariance \
  --train_dir runs_eval
sleep 15

echo "=== batch-size-gen sweep on ML flagship ($(date -u)) ==="
timeout 2700 python main.py --restore "$ML_CKPT" --train_steps 0 \
  --test_size 200 --evaluate_batch_gen --label ml_batchgen \
  --train_dir runs_eval
sleep 15

echo "=== r4 tail complete ($(date -u)) ==="
