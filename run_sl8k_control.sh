#!/bin/bash
# Step-matched single-label control for the multi-label posterior pilot:
# same 8k cosine schedule, same seed/dataset, label_samples=1, then the
# same raw-proposal battery -> UNIFORMITY_SUMMARY_SL8K.json. Makes the
# ML8K comparison step-matched (the 167k-npz comparison in
# UNIFORMITY_SUMMARY_ML8K.json is same-formulas but not same-steps).
#
#   nohup bash run_sl8k_control.sh > sl8k_control.log 2>&1 &
set -u
cd /root/repo

echo "=== train SL control (single label, 8k steps) ($(date -u)) ==="
timeout 1800 python diffusion_training.py --train_steps 8000 \
  --label sl8k --train_dir runs_ml --eval_every 4000 --ckpt_every 4000
sleep 10

SL_CKPT=$(ls -dt runs_ml/*sl8k*/ckpt 2>/dev/null | head -1)
if [ -n "$SL_CKPT" ]; then
  echo "=== export SL-8k npz ($(date -u)) ==="
  timeout 600 env DSAT_FORCE_CPU=1 python export_pretrained.py \
    --ckpt "$SL_CKPT" --model query_sat \
    --out pretrained/query_sat_3sat_diffusion_sl8k.npz
  echo "=== nofreeze battery: SL-8k control ($(date -u)) ==="
  timeout 1500 python uniformity_benchmark.py --model_ckpt "$SL_CKPT" \
    --n_formulas 8 --k 10 --variants uniform,diffusion_nofreeze \
    --out benchmarks_sl8k.jsonl --summary_out UNIFORMITY_SUMMARY_SL8K.json
fi
echo "=== SL-8k control complete ($(date -u)) ==="
