#!/bin/bash
# Stage 4: paired pure-model uniformity comparison. The ML battery
# (stage 1) measures diffusion_nofreeze on the multi-label checkpoint;
# this runs the SAME variant on the single-label round-2 checkpoint so
# the posterior-training effect is isolated checkpoint-vs-checkpoint on
# identical formulas (UNIFORMITY_SUMMARY.json's nofreeze number came
# from the earlier first-167k checkpoint).
#
#   nohup bash run_ml_tail4.sh <stage3_pid> > ml_tail4.log 2>&1 &
set -u
PREV_PID=${1:?usage: run_ml_tail4.sh <stage3_pid>}

echo "waiting on stage-3 pid $PREV_PID ($(date -u))"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 60; done
sleep 15

echo "=== nofreeze battery on the single-label checkpoint ($(date -u)) ==="
timeout 3600 python uniformity_benchmark.py \
  --model_ckpt pretrained/query_sat_3sat_diffusion.npz \
  --n_formulas 8 --k 10 \
  --variants uniform,diffusion_nofreeze \
  --out benchmarks_sl_nofreeze.jsonl \
  --summary_out UNIFORMITY_SUMMARY_SL_NOFREEZE.json

echo "=== stage-4 queue complete ($(date -u)) ==="
