#!/bin/bash
# Round-2 continuation TPU queue (sequential, one TPU process at a time):
# 1. wait for the multi-label flagship wrapper (run_flagship.sh LABEL=ml167k)
# 2. export the ML checkpoint to a portable pretrained npz
# 3. uniformity battery on the ML checkpoint (full variant set) — the
#    experiment this queue exists for: does posterior training (multi-label
#    banks) close the pure-diffusion cross-component gap vs
#    UNIFORMITY_SUMMARY_R2B.json?
# 4. ANF schedule completion: warm-start from the committed step-116k npz
#    and run the remaining ~14k steps at the cosine tail lr, then the
#    full-testset eval
# 5. final bench reading
#
#   nohup bash run_ml_tail.sh <flagship_wrapper_pid> > ml_tail.log 2>&1 &
set -u
FLAG_PID=${1:?usage: run_ml_tail.sh <flagship_wrapper_pid>}
CPU_ENV="env DSAT_FORCE_CPU=1"

echo "waiting on ML flagship wrapper pid $FLAG_PID ($(date -u))"
while kill -0 "$FLAG_PID" 2>/dev/null; do sleep 60; done
echo "=== ML flagship done ($(date -u)) ==="
sleep 15   # let the tunnel connection fully close

ML_CKPT=$(ls -dt runs_flagship/query_sat_3-sat_ml167k_*/ckpt 2>/dev/null | head -1)
if [ -n "$ML_CKPT" ]; then
  echo "=== export ML pretrained from $ML_CKPT ==="
  timeout 900 $CPU_ENV python export_pretrained.py --ckpt "$ML_CKPT" \
    --model query_sat --out pretrained/query_sat_3sat_diffusion_ml.npz

  echo "=== uniformity battery on the ML checkpoint ($(date -u)) ==="
  timeout 5400 python uniformity_benchmark.py --model_ckpt "$ML_CKPT" \
    --n_formulas 8 --k 10 \
    --variants uniform,walksat,diffusion,diffusion_nofreeze,diffusion_latefreeze,diffusion_mh,diffusion_latefreeze_mh \
    --out benchmarks_flagship_ml.jsonl \
    --summary_out UNIFORMITY_SUMMARY_ML.json
fi
sleep 15

echo "=== ANF schedule completion: 116k -> 130k ($(date -u)) ==="
# cosine tail: the 130k schedule sits at ~5e-4 at step 116k
# (1e-3 * (0.5 + 0.5*cos_factor(116/130))); decay the remaining 14k steps
STEPS=14000 LR=5e-4 LABEL=finish130k INIT_NPZ=pretrained/anf_sat_sha1_r17.npz \
  DEADLINE_S=7200 STALE_S=900 bash run_anf_flagship.sh
sleep 15
ANF_CKPT=$(ls -dt runs_anf/anf_sat_r17_finish130k_*/ckpt 2>/dev/null | head -1)
if [ -n "$ANF_CKPT" ]; then
  echo "=== ANF full-testset eval ($(date -u)) ==="
  timeout 3600 python anf_eval.py --ckpt "$ANF_CKPT" \
    --out ANF_EVAL_130K.json
  echo "=== export finished ANF pretrained ==="
  timeout 900 $CPU_ENV python export_pretrained.py --ckpt "$ANF_CKPT" \
    --model anf_sat --out pretrained/anf_sat_sha1_r17_130k.npz
fi
sleep 15

echo "=== final bench ($(date -u)) ==="
timeout 2400 python bench.py | tee BENCH_SELF_r02c.json

echo "=== ml tail queue complete ($(date -u)) ==="
