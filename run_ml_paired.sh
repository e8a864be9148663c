#!/bin/bash
# Paired multi-label posterior experiment, scaled to fit one session
# (the full ml167k flagship queue never got TPU time): train QuerySAT
# diffusion with a 16-sample solution bank per instance vs the standard
# single-label regime at MATCHED 8k-step cosine schedules, then read out
# the RAW proposal uniformity (diffusion_nofreeze — no refiners) on the
# same 8-formula battery. Question: does training the denoising posterior
# over solution sets reduce the proposal's mode collapse at equal steps?
#
#   nohup bash run_ml_paired.sh <prev_queue_pid> > ml_paired.log 2>&1 &
set -u
cd /root/repo
PREV_PID=${1:?usage: run_ml_paired.sh <prev_queue_pid>}

echo "waiting on previous TPU queue pid $PREV_PID ($(date -u))"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 20; done
sleep 10

echo "=== build k16 multi-label cache ($(date -u)) ==="
timeout 1200 env DSAT_FORCE_CPU=1 python build_3sat_cache.py --label_samples 16

echo "=== train ML (16-label bank, 8k steps) ($(date -u)) ==="
timeout 1500 python diffusion_training.py --train_steps 8000 \
  --label_samples 16 --label ml8k --train_dir runs_ml \
  --eval_every 4000 --ckpt_every 4000
sleep 10

echo "=== train SL (single label, 8k steps, same seed) ($(date -u)) ==="
timeout 1500 python diffusion_training.py --train_steps 8000 \
  --label sl8k --train_dir runs_ml \
  --eval_every 4000 --ckpt_every 4000
sleep 10

ML_CKPT=$(ls -dt runs_ml/*ml8k*/ckpt 2>/dev/null | head -1)
SL_CKPT=$(ls -dt runs_ml/*sl8k*/ckpt 2>/dev/null | head -1)

if [ -n "$ML_CKPT" ]; then
  echo "=== nofreeze battery: ML checkpoint ($(date -u)) ==="
  timeout 900 python uniformity_benchmark.py --model_ckpt "$ML_CKPT" \
    --n_formulas 8 --k 10 --variants uniform,diffusion_nofreeze \
    --out benchmarks_ml8k.jsonl --summary_out UNIFORMITY_SUMMARY_ML8K.json
fi
sleep 10
if [ -n "$SL_CKPT" ]; then
  echo "=== nofreeze battery: SL checkpoint ($(date -u)) ==="
  timeout 900 python uniformity_benchmark.py --model_ckpt "$SL_CKPT" \
    --n_formulas 8 --k 10 --variants uniform,diffusion_nofreeze \
    --out benchmarks_sl8k.jsonl --summary_out UNIFORMITY_SUMMARY_SL8K.json
fi

echo "=== ML paired experiment complete ($(date -u)) ==="
