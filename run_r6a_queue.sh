#!/bin/bash
# Round-6a queue — the definitive full-schedule isolation run, relaunched
# after a machine reset wiped runs_flagship/ and the dataset caches (the
# committed run_r5r_queue.sh never executed: its r5q chain marker never
# appeared). Plan is r5r's pre-registered protocol verbatim, plus
# --mega_steps 8 (bench default since 928bf67; bit-exact per
# tests/test_mega_step.py):
#   167k reference schedule from scratch, k64 label bank,
#   label_isolation_alpha=0.45 (dose-response zero for the ~-0.20
#   basin-volume slope, 2cfcc73) -> batteries seed 0+1 -> bias pairing
#   vs the raw 167k baseline -> solve evals tries=1/4 -> export.
# Waits on the k64 cache rebuild (logs/cache_k64_r6.log prints 'test ok').
# Fresh machine = empty server-side compile cache: STALE_S raised to
# 1200 s so a long first-shape compile doesn't trip the watchdog.
#
#   nohup bash run_r6a_queue.sh > logs/r6a_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 240); do
  grep -q 'test ok' logs/cache_k64_r6.log 2>/dev/null && break
  sleep 10
done
if ! grep -q 'test ok' logs/cache_k64_r6.log 2>/dev/null; then
  echo "ABORT: k64 cache build never finished"; exit 1
fi
echo "=== cache ready, launching training ($(date -u)) ==="

START=$(date +%s)
DEADLINE_S=${DEADLINE_S:-12600}          # training cap: 3h30m
STALE_S=1200
STARTUP_GRACE_S=2400
LABEL=mlk64iso45full
CKPT=""
for i in $(seq 1 12); do
  left=$((DEADLINE_S - ($(date +%s) - START)))
  [ "$left" -le 300 ] && { echo "=== training deadline reached ==="; break; }
  echo "=== $LABEL attempt $i, ${left}s left ($(date -u)) ==="
  args=(--train_steps 167000 --train_size 60000 --test_size 2000
        --label_samples 64 --label_isolation_alpha 0.45
        --mega_steps 8
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
# exit-code discipline (ADVICE r4): every artifact step is checked; a
# failed step prints a distinct failure marker AND flips the final
# marker, so downstream queues can distinguish partial completion
FAILS=0
step() {
  "$@"
  local rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "=== STEP FAILED rc=$rc: $* ($(date -u)) ==="
    FAILS=$((FAILS + 1))
  fi
}
echo "=== export first (durable artifact before long batteries) ($(date -u)) ==="
step timeout 900 env JAX_PLATFORM_NAME=cpu python export_pretrained.py \
  --ckpt "$RUN" --out pretrained/query_sat_3sat_diffusion_mlk64_iso45.npz \
  --note "167k full schedule, k64 bank, label_isolation_alpha=0.45, mega8"
sleep 15
echo "=== battery seed 0 ($(date -u)) ==="
step timeout 2400 python uniformity_benchmark.py --model_ckpt "$RUN" \
  --n_formulas 8 --k 40 --variants uniform,diffusion_nofreeze,diffusion_mh_xor \
  --out benchmarks_${LABEL}_k40.jsonl \
  --summary_out UNIFORMITY_SUMMARY_MLK64ISO45FULL.json
sleep 15
echo "=== solve evals ($(date -u)) ==="
step timeout 900 python solve_eval.py --model_ckpt "$RUN" --label_samples 64 \
  --tries 1 --out SOLVE_EVAL_MLK64ISO45FULL_T1.json
sleep 15
step timeout 1200 python solve_eval.py --model_ckpt "$RUN" --label_samples 64 \
  --tries 4 --out SOLVE_EVAL_MLK64ISO45FULL_T4.json
sleep 15
echo "=== battery seed 1 ($(date -u)) ==="
step timeout 2400 python uniformity_benchmark.py --model_ckpt "$RUN" \
  --n_formulas 8 --k 40 --seed 1 --variants uniform,diffusion_nofreeze \
  --out benchmarks_${LABEL}_s1_k40.jsonl \
  --summary_out UNIFORMITY_SUMMARY_MLK64ISO45FULL_S1.json
sleep 15
step timeout 600 env JAX_PLATFORM_NAME=cpu python benchmarks/solution_bias.py \
  --a benchmarks_${LABEL}_k40.jsonl --b benchmarks_mlk64_final_k40.jsonl \
  --a_variant diffusion_nofreeze --b_variant diffusion_nofreeze \
  --json SOLUTION_BIAS_ISO45FULL_VS_RAW.json
if [ "$FAILS" -eq 0 ]; then
  echo "=== r6a queue done ($(date -u)) ==="
else
  echo "=== r6a queue done WITH $FAILS FAILED STEPS ($(date -u)) ==="
fi
