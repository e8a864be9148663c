#!/bin/bash
# Round-7a queue — closed-loop per-solution reweighting (VERDICT r4 item 1).
#
#   1. wait until measure_bank_freq has >=160 batch parts (or exits), then
#      stop it by PID and finalize the frequency table on CPU
#   2. fine-tune the iso45full flagship 20k steps with label logits
#      alpha*iso + beta*(-log freq_hat), beta=1 (treatment) and beta=0
#      (protocol control), on the measured batch subset; export npzs
#   3. re-measure both fine-tuned models on the first 16 batches and run
#      the in-sample closed-loop analysis (slope/rho/TVD before vs after)
#   4. widened 24-formula uniformity panels (VERDICT r4 item 3):
#      full variants for rw1 + iso45full, nofreeze-only for ctl + raw k64
#   5. single-try solve evals for both fine-tunes
#
#   nohup bash run_r7a_queue.sh > logs/r7a_queue.log 2>&1 &
set -u
cd /root/repo

FREQ=freq_iso45full.npz
PARTS=$FREQ.parts
MEAS_PID=$(awk '{print $2}' logs/r7_freq_measure.pid 2>/dev/null)
TARGET_PARTS=160

echo "=== waiting for $TARGET_PARTS measurement parts ($(date -u)) ==="
for i in $(seq 1 1440); do
  n=$(ls "$PARTS" 2>/dev/null | wc -l)
  [ "$n" -ge "$TARGET_PARTS" ] && break
  if [ -n "$MEAS_PID" ] && ! kill -0 "$MEAS_PID" 2>/dev/null; then
    echo "measurement process exited early at $n parts"; break
  fi
  sleep 20
done
N=$(ls "$PARTS" 2>/dev/null | wc -l)
if [ "$N" -lt 8 ]; then echo "ABORT: only $N parts"; exit 1; fi
if [ -n "$MEAS_PID" ] && kill -0 "$MEAS_PID" 2>/dev/null; then
  echo "=== stopping measurement PID $MEAS_PID at $N parts ($(date -u)) ==="
  kill "$MEAS_PID"; sleep 20
  kill -9 "$MEAS_PID" 2>/dev/null
  sleep 5
fi
# parts are written in order; count only the contiguous prefix
N=0
while [ -f "$PARTS/part_$N.npz" ]; do N=$((N + 1)); done
echo "=== finalizing $N contiguous parts ($(date -u)) ==="

FAILS=0
step() {
  "$@"
  local rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "=== STEP FAILED rc=$rc: $* ($(date -u)) ==="
    FAILS=$((FAILS + 1))
  fi
}

BASE=pretrained/query_sat_3sat_diffusion_mlk64_iso45.npz
step timeout 1800 env JAX_PLATFORM_NAME=cpu python measure_bank_freq.py \
  --model_ckpt "$BASE" --chains 96 --chunk 32 --max_batches "$N" --out "$FREQ"
[ -s "$FREQ" ] || { echo "ABORT: no frequency table"; exit 1; }

ft_run() {  # label, beta, out_npz
  local LABEL=$1 BETA=$2 OUT=$3
  echo "=== fine-tune $LABEL beta=$BETA ($(date -u)) ==="
  local args=(--train_steps 20000 --train_size 60000 --test_size 2000
        --label_samples 64 --max_nodes_per_batch 20000
        --label_logit_table "$FREQ" --label_isolation_alpha 0.45
        --label_reweight_beta "$BETA" --train_batch_limit "$N"
        --init_npz "$BASE" --initial_learning_rate 2e-4
        --mega_steps 8 --eval_every 4000 --ckpt_every 4000
        --label "$LABEL" --train_dir runs_flagship)
  timeout -k 60 3000 python diffusion_training.py "${args[@]}"
  local rc=$?
  if [ "$rc" -ne 0 ]; then
    local CKPT
    CKPT=$(ls -dt runs_flagship/query_sat_3-sat_${LABEL}_*/ckpt 2>/dev/null | head -1)
    echo "=== $LABEL exited rc=$rc; one retry from ${CKPT:-scratch} ==="
    sleep 10
    timeout -k 60 3000 python diffusion_training.py "${args[@]}" \
      ${CKPT:+--restore "$CKPT"} || { echo "=== $LABEL FAILED ==="; FAILS=$((FAILS+1)); }
  fi
  local RUN
  RUN=$(ls -dt runs_flagship/query_sat_3-sat_${LABEL}_*/ckpt 2>/dev/null | head -1)
  [ -n "$RUN" ] || { echo "=== no $LABEL ckpt ==="; FAILS=$((FAILS+1)); return 1; }
  step timeout 900 env JAX_PLATFORM_NAME=cpu python export_pretrained.py \
    --ckpt "$RUN" --out "$OUT" \
    --note "20k ft of iso45full: closed-loop reweight beta=$BETA, alpha=0.45, first $N batches"
  sleep 10
}

ft_run mlk64iso45rw1 1.0 pretrained/query_sat_3sat_diffusion_mlk64_iso45_rw1.npz
ft_run mlk64iso45rwctl 0.0 pretrained/query_sat_3sat_diffusion_mlk64_iso45_rwctl.npz

RW1=pretrained/query_sat_3sat_diffusion_mlk64_iso45_rw1.npz
CTL=pretrained/query_sat_3sat_diffusion_mlk64_iso45_rwctl.npz

echo "=== in-sample re-measures ($(date -u)) ==="
step timeout 2400 python measure_bank_freq.py --model_ckpt "$RW1" \
  --chains 96 --chunk 32 --max_batches 16 --out freq_rw1_insample.npz
sleep 10
step timeout 2400 python measure_bank_freq.py --model_ckpt "$CTL" \
  --chains 96 --chunk 32 --max_batches 16 --out freq_rwctl_insample.npz
sleep 10
step timeout 900 env JAX_PLATFORM_NAME=cpu python benchmarks/closed_loop_analysis.py \
  --before "$FREQ" --after freq_rw1_insample.npz --batches 16 \
  --json CLOSED_LOOP_RW1_INSAMPLE.json
step timeout 900 env JAX_PLATFORM_NAME=cpu python benchmarks/closed_loop_analysis.py \
  --before "$FREQ" --after freq_rwctl_insample.npz --batches 16 \
  --json CLOSED_LOOP_CTL_INSAMPLE.json

echo "=== widened 24-formula panels ($(date -u)) ==="
step timeout 7200 python uniformity_benchmark.py --model_ckpt "$RW1" \
  --n_formulas 24 --k 40 \
  --variants uniform,diffusion_nofreeze,diffusion_mh_xor \
  --out benchmarks_rw1_p24.jsonl \
  --summary_out UNIFORMITY_SUMMARY_RW1_P24.json
sleep 10
step timeout 7200 python uniformity_benchmark.py --model_ckpt "$BASE" \
  --n_formulas 24 --k 40 \
  --variants uniform,diffusion_nofreeze,diffusion_mh_xor \
  --out benchmarks_iso45full_p24.jsonl \
  --summary_out UNIFORMITY_SUMMARY_ISO45FULL_P24.json
sleep 10
step timeout 3600 python uniformity_benchmark.py --model_ckpt "$CTL" \
  --n_formulas 24 --k 40 --variants uniform,diffusion_nofreeze \
  --out benchmarks_rwctl_p24.jsonl \
  --summary_out UNIFORMITY_SUMMARY_RWCTL_P24.json
sleep 10
step timeout 3600 python uniformity_benchmark.py \
  --model_ckpt pretrained/query_sat_3sat_diffusion_mlk64.npz \
  --n_formulas 24 --k 40 --variants uniform,diffusion_nofreeze \
  --out benchmarks_mlk64_p24.jsonl \
  --summary_out UNIFORMITY_SUMMARY_MLK64_P24.json
sleep 10

echo "=== solve evals ($(date -u)) ==="
step timeout 1200 python solve_eval.py --model_ckpt "$RW1" --label_samples 64 \
  --tries 1 --out SOLVE_EVAL_RW1_T1.json
sleep 10
step timeout 1200 python solve_eval.py --model_ckpt "$CTL" --label_samples 64 \
  --tries 1 --out SOLVE_EVAL_RWCTL_T1.json

if [ "$FAILS" -eq 0 ]; then
  echo "=== r7a queue done ($(date -u)) ==="
else
  echo "=== r7a queue done WITH $FAILS FAILED STEPS ($(date -u)) ==="
fi
