#!/bin/bash
# Night TPU queue (sequential, one TPU process at a time):
# 1. wait for the ANF flagship wrapper to exit (it self-deadlines)
# 2. export the ANF checkpoint to a portable pretrained npz
# 3. diffusion flagship retrain (deadline-capped, restart-on-failure)
# 4. export its checkpoint to pretrained npz
# 5. uniformity battery on the fresh checkpoint
# 6. final bench reading
#
#   nohup bash run_night_queue.sh <anf_wrapper_pid> > night_queue.log 2>&1 &
set -u
ANF_PID=${1:?usage: run_night_queue.sh <anf_wrapper_pid>}
DIFF_DEADLINE_S=${DIFF_DEADLINE_S:-12600}
CPU_ENV="env DSAT_FORCE_CPU=1"

echo "waiting on ANF wrapper pid $ANF_PID ($(date -u))"
while kill -0 "$ANF_PID" 2>/dev/null; do sleep 60; done
echo "=== ANF flagship done ($(date -u)) ==="
sleep 15   # let the tunnel connection fully close

ANF_CKPT=$(ls -dt runs_anf/anf_sat_r17_flagship160k_*/ckpt 2>/dev/null | head -1)
if [ -n "$ANF_CKPT" ]; then
  echo "=== export ANF pretrained from $ANF_CKPT ==="
  timeout 900 $CPU_ENV python export_pretrained.py --ckpt "$ANF_CKPT" \
    --model anf_sat --out pretrained/anf_sat_sha1_r17.npz
fi

echo "=== diffusion flagship retrain ($(date -u)) ==="
STEPS=167000 TRAIN_SIZE=60000 DEADLINE_S=$DIFF_DEADLINE_S \
  bash run_flagship.sh
echo "=== diffusion flagship wrapper exited ($(date -u)) ==="
sleep 15

DIFF_CKPT=$(ls -dt runs_flagship/query_sat_3-sat_flagship167k_*/ckpt 2>/dev/null | head -1)
if [ -n "$DIFF_CKPT" ]; then
  echo "=== export diffusion pretrained from $DIFF_CKPT ==="
  timeout 900 $CPU_ENV python export_pretrained.py --ckpt "$DIFF_CKPT" \
    --model query_sat --out pretrained/query_sat_3sat_diffusion.npz

  echo "=== uniformity battery ($(date -u)) ==="
  timeout 4200 python uniformity_benchmark.py --model_ckpt "$DIFF_CKPT" \
    --n_formulas 8 --k 10 \
    --variants uniform,walksat,diffusion,diffusion_latefreeze,diffusion_latefreeze_mh,diffusion_mh \
    --out benchmarks_flagship_r2b.jsonl \
    --summary_out UNIFORMITY_SUMMARY_R2B.json
fi

echo "=== final bench ($(date -u)) ==="
timeout 2400 python bench.py | tee BENCH_SELF_r02b.json

echo "=== night queue complete ($(date -u)) ==="
