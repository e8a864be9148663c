#!/bin/bash
# Round-5r queue — chained on run_r5q_queue.sh's marker. THE definitive
# isolation run: full 167k reference schedule from scratch with
# label_isolation_alpha=0.45 (the dose-response zero for a baseline
# slope of ~-0.20 at ~0.47 slope-units/alpha), so the anti-basin-volume
# tilt acts during the whole schedule instead of a solve-degrading
# fine-tune (the 15k fine-tune protocol itself cost ~30pp solve even at
# alpha=0 — SOLVE_EVAL_MLK64ISOCTL.json). Restart-on-failure with a
# stale-log watchdog (tunnel deadlock pattern), then battery (seed 0 and
# seed 1), bias pairing, solve evals, export.
#
#   nohup bash run_r5r_queue.sh > logs/r5r_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5q queue done' logs/r5q_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5q queue done' logs/r5q_queue.log 2>/dev/null; then
  echo "ABORT: r5q queue completion marker never appeared"; exit 1
fi

START=$(date +%s)
DEADLINE_S=${DEADLINE_S:-13500}          # training cap: 3h45m
STALE_S=900
STARTUP_GRACE_S=1500
LABEL=mlk64iso45full
CKPT=""
for i in $(seq 1 12); do
  left=$((DEADLINE_S - ($(date +%s) - START)))
  [ "$left" -le 300 ] && { echo "=== training deadline reached ==="; break; }
  echo "=== $LABEL attempt $i, ${left}s left ($(date -u)) ==="
  args=(--train_steps 167000 --train_size 60000 --test_size 2000
        --label_samples 64 --label_isolation_alpha 0.45
        --eval_every 4000 --ckpt_every 2000
        --label "$LABEL" --train_dir runs_flagship
        --max_nodes_per_batch 20000)
  if [ -n "$CKPT" ]; then args+=(--restore "$CKPT"); fi
  attempt_start=$(date +%s)
  setsid timeout -k 60 "$left" python diffusion_training.py "${args[@]}" &
  pid=$!
  code=""
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    log=$(ls -t runs_flagship/query_sat_3-sat_${LABEL}_*/train_log.jsonl 2>/dev/null | head -1)
    if [ -n "$log" ] && [ "$(stat -c %Y "$log")" -ge "$attempt_start" ]; then
      age=$((now - $(stat -c %Y "$log")))
    else
      age=$((now - attempt_start))
      [ "$age" -lt "$STARTUP_GRACE_S" ] && age=0
    fi
    if [ "$age" -gt "$STALE_S" ]; then
      echo "=== watchdog: no progress ${age}s; killing $pid ($(date -u)) ==="
      kill -- -"$pid" 2>/dev/null; sleep 10; kill -9 -- -"$pid" 2>/dev/null
      code=124
      break
    fi
  done
  if [ -z "$code" ]; then wait "$pid"; code=$?; fi
  if [ "$code" -eq 0 ]; then echo "=== finished cleanly ==="; break; fi
  if [ -z "$CKPT" ]; then
    CKPT=$(ls -dt runs_flagship/query_sat_3-sat_${LABEL}_*/ckpt 2>/dev/null | head -1)
  fi
  echo "=== exited with $code; restarting from ${CKPT:-scratch} ==="
  sleep 10
done

RUN=$(ls -dt runs_flagship/query_sat_3-sat_${LABEL}_*/ckpt 2>/dev/null | head -1)
if [ -z "$RUN" ]; then echo "no $LABEL checkpoint; abort tail"; exit 1; fi
echo "=== battery seed 0 ($(date -u)) ==="
timeout 2400 python uniformity_benchmark.py --model_ckpt "$RUN" \
  --n_formulas 8 --k 40 --variants uniform,diffusion_nofreeze,diffusion_mh_xor \
  --out benchmarks_${LABEL}_k40.jsonl \
  --summary_out UNIFORMITY_SUMMARY_MLK64ISO45FULL.json
sleep 15
echo "=== battery seed 1 ($(date -u)) ==="
timeout 2400 python uniformity_benchmark.py --model_ckpt "$RUN" \
  --n_formulas 8 --k 40 --seed 1 --variants uniform,diffusion_nofreeze \
  --out benchmarks_${LABEL}_s1_k40.jsonl \
  --summary_out UNIFORMITY_SUMMARY_MLK64ISO45FULL_S1.json
sleep 15
echo "=== solve evals ($(date -u)) ==="
timeout 900 python solve_eval.py --model_ckpt "$RUN" --label_samples 64 \
  --tries 1 --out SOLVE_EVAL_MLK64ISO45FULL_T1.json
sleep 15
timeout 1200 python solve_eval.py --model_ckpt "$RUN" --label_samples 64 \
  --tries 4 --out SOLVE_EVAL_MLK64ISO45FULL_T4.json
sleep 15
timeout 600 env JAX_PLATFORM_NAME=cpu python benchmarks/solution_bias.py \
  --a benchmarks_${LABEL}_k40.jsonl --b benchmarks_mlk64_final_k40.jsonl \
  --a_variant diffusion_nofreeze --b_variant diffusion_nofreeze \
  --json SOLUTION_BIAS_ISO45FULL_VS_RAW.json || echo "bias pairing FAILED"
timeout 900 env JAX_PLATFORM_NAME=cpu python export_pretrained.py \
  --ckpt "$RUN" --out pretrained/query_sat_3sat_diffusion_mlk64_iso45.npz \
  --note "167k full schedule, k64 bank, label_isolation_alpha=0.45"
echo "=== r5r queue done ($(date -u)) ==="
