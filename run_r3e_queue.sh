#!/bin/bash
# Round-3e TPU queue — chained after run_r3d_queue.sh:
# 1. Re-run the ref-regime bench with the fixed two-pass timing (the
#    first run's per-batch numbers were contaminated by the tunnel's
#    slow-first-dispatches-of-a-fresh-executable behavior; executables
#    are now persistent-cached so this pass is cheap and steady-state).
# 2. ANF round-count scaling: the documented next lever after multi-try
#    (ANF_EVAL_130K_T4.json) — evaluate the finished 130k checkpoint at
#    test_rounds 64 and 128 (trained at 16, evals so far at 32).
# 3. Bank-size ablation for the uniformity negative result's hypothesis
#    (b) (STATUS.md: 16-sample banks under-represent solution sets of
#    18-24): train 8k steps with 64-sample banks (same seed/schedule as
#    the k16 pilot) and read the raw-proposal (nofreeze) battery on the
#    same formulas. k16@8k read mean entropy gap 0.195; if k64 drops it
#    materially, the residual gap is bank coverage; if unchanged, the
#    per-variable factorized reverse kernel (hypothesis a) dominates.
# 4. The never-run-on-HW eval sweeps on the ML167k flagship ckpt:
#    variable-gen, batch-size-gen, invariance (reference main.py:172-233).
#
#   nohup bash run_r3e_queue.sh <r3d_pid> > logs/r3e_queue.log 2>&1 &
set -u
cd /root/repo
PREV_PID=${1:?usage: run_r3e_queue.sh <r3d_pid>}

echo "waiting on r3d queue pid $PREV_PID ($(date -u))"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
sleep 15

echo "=== ref-regime bench, fixed two-pass timing ($(date -u)) ==="
timeout 3600 python benchmarks/bench_ref_regime.py --out BENCH_REF_REGIME.json
sleep 15

echo "=== ANF round-scaling: test_rounds=64 ($(date -u)) ==="
timeout 2700 python anf_eval.py --ckpt pretrained/anf_sat_sha1_r17_130k.npz \
  --test_rounds 64 --out ANF_EVAL_130K_R64.json
sleep 15
echo "=== ANF round-scaling: test_rounds=128 ($(date -u)) ==="
timeout 3600 python anf_eval.py --ckpt pretrained/anf_sat_sha1_r17_130k.npz \
  --test_rounds 128 --out ANF_EVAL_130K_R128.json
sleep 15

echo "=== build k64 multi-label cache (CPU, jax-free) ($(date -u)) ==="
timeout 2400 env DSAT_FORCE_CPU=1 python build_3sat_cache.py --label_samples 64
echo "=== train ML k64 bank, 8k steps (same schedule as k16 pilot) ($(date -u)) ==="
# DSAT_BLOCK_BF16=0: the k16 pilot this ablates against trained f32;
# keep the only changed variable the bank size.
timeout 2400 env DSAT_BLOCK_BF16=0 python diffusion_training.py \
  --train_steps 8000 \
  --label_samples 64 --label ml8k_k64 --train_dir runs_ml \
  --eval_every 4000 --ckpt_every 4000
sleep 15

K64_CKPT=$(ls -dt runs_ml/*ml8k_k64*/ckpt 2>/dev/null | head -1)
if [ -n "$K64_CKPT" ]; then
  echo "=== nofreeze battery: k64 checkpoint ($(date -u)) ==="
  timeout 1800 python uniformity_benchmark.py --model_ckpt "$K64_CKPT" \
    --n_formulas 8 --k 10 --variants uniform,diffusion_nofreeze \
    --out benchmarks_ml8k_k64.jsonl \
    --summary_out UNIFORMITY_SUMMARY_ML8K_K64.json
fi
sleep 15

ML_CKPT=$(ls -dt runs_flagship/query_sat_3-sat_ml167k_*/ckpt 2>/dev/null | head -1)
if [ -n "$ML_CKPT" ]; then
  echo "=== variable-gen sweep on ML167k flagship ($(date -u)) ==="
  timeout 4500 python main.py --restore "$ML_CKPT" --train_steps 0 \
    --test_size 200 --evaluate_variable_gen --label ml_vargen \
    --train_dir runs_eval
  sleep 15
  echo "=== batch-size-gen sweep on ML167k flagship ($(date -u)) ==="
  timeout 4500 python main.py --restore "$ML_CKPT" --train_steps 0 \
    --test_size 200 --evaluate_batch_gen --label ml_batchgen \
    --train_dir runs_eval
  sleep 15
  echo "=== invariance test on ML167k flagship ($(date -u)) ==="
  timeout 2400 python main.py --restore "$ML_CKPT" --train_steps 0 \
    --test_size 200 --test_invariance --label ml_invariance \
    --train_dir runs_eval
fi

echo "=== r3e queue complete ($(date -u)) ==="
