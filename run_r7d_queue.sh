#!/bin/bash
# Round-7d queue — chained on run_r7c_queue.sh's marker. Closed-loop
# dose escalation: the r7a fine-tunes at lr 2e-4 (~13k effective steps)
# moved the per-solution bias only marginally in-sample (slope 0.61 ctl
# -> 0.54 rw1, CLOSED_LOOP_*_INSAMPLE.json). Round 4's isolation
# fine-tunes zeroed the CENTRALITY slope at lr 1e-3 x 15k — this run
# applies that same dose to the per-solution tilt (beta=1, lr 1e-3), so
# the outcome is a clean positive (bias steerable per-solution) or a
# clean dose-matched negative.
#
#   nohup bash run_r7d_queue.sh > logs/r7d_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2160); do
  grep -q 'r7c queue done' logs/r7c_queue.log 2>/dev/null && break
  sleep 20
done
if ! grep -q 'r7c queue done' logs/r7c_queue.log 2>/dev/null; then
  echo "ABORT: r7c queue completion marker never appeared"; exit 1
fi
echo "=== r7d start ($(date -u)) ==="

FAILS=0
step() {
  "$@"
  local rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "=== STEP FAILED rc=$rc: $* ($(date -u)) ==="
    FAILS=$((FAILS + 1))
  fi
}

FREQ=freq_iso45full.npz
BASE=pretrained/query_sat_3sat_diffusion_mlk64_iso45.npz
N=161
LABEL=mlk64iso45rw1hi
OUT=pretrained/query_sat_3sat_diffusion_mlk64_iso45_rw1hi.npz

echo "=== fine-tune $LABEL beta=1 lr=1e-3 ($(date -u)) ==="
args=(--train_steps 20000 --train_size 60000 --test_size 2000
      --label_samples 64 --max_nodes_per_batch 20000
      --label_logit_table "$FREQ" --label_isolation_alpha 0.45
      --label_reweight_beta 1.0 --train_batch_limit "$N"
      --init_npz "$BASE" --initial_learning_rate 1e-3
      --mega_steps 8 --eval_every 4000 --ckpt_every 4000
      --label "$LABEL" --train_dir runs_flagship)
timeout -k 60 3000 python diffusion_training.py "${args[@]}"
rc=$?
if [ "$rc" -ne 0 ]; then
  CKPT=$(ls -dt runs_flagship/query_sat_3-sat_${LABEL}_*/ckpt 2>/dev/null | head -1)
  echo "=== $LABEL exited rc=$rc; one retry from ${CKPT:-scratch} ==="
  sleep 30
  timeout -k 60 3000 python diffusion_training.py "${args[@]}" \
    ${CKPT:+--restore "$CKPT"} || { echo "=== $LABEL FAILED ==="; FAILS=$((FAILS+1)); }
fi
RUN=$(ls -dt runs_flagship/query_sat_3-sat_${LABEL}_*/ckpt 2>/dev/null | head -1)
if [ -n "$RUN" ]; then
  step timeout 900 env JAX_PLATFORM_NAME=cpu python export_pretrained.py \
    --ckpt "$RUN" --out "$OUT" \
    --note "20k ft of iso45full: closed-loop beta=1 at lr 1e-3 (round-4 dose), first $N batches"
  sleep 30
  echo "=== in-sample re-measure ($(date -u)) ==="
  step timeout 2400 python measure_bank_freq.py --model_ckpt "$OUT" \
    --chains 96 --chunk 32 --max_batches 16 --out freq_rw1hi_insample.npz
  step timeout 900 env JAX_PLATFORM_NAME=cpu python benchmarks/closed_loop_analysis.py \
    --before "$FREQ" --after freq_rw1hi_insample.npz --batches 16 \
    --json CLOSED_LOOP_RW1HI_INSAMPLE.json
  sleep 30
  echo "=== held-out nofreeze battery + solve ($(date -u)) ==="
  step timeout 3000 python uniformity_benchmark.py --model_ckpt "$OUT" \
    --n_formulas 8 --k 40 --variants uniform,diffusion_nofreeze \
    --out benchmarks_rw1hi_k40.jsonl \
    --summary_out UNIFORMITY_SUMMARY_RW1HI.json
  sleep 30
  step timeout 1200 python solve_eval.py --model_ckpt "$OUT" \
    --label_samples 64 --tries 1 --out SOLVE_EVAL_RW1HI_T1.json
else
  echo "=== no $LABEL checkpoint ==="; FAILS=$((FAILS+1))
fi

if [ "$FAILS" -eq 0 ]; then
  echo "=== r7d queue done ($(date -u)) ==="
else
  echo "=== r7d queue done WITH $FAILS FAILED STEPS ($(date -u)) ==="
fi
