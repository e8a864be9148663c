#!/bin/bash
# Round-3h queue — finish the k64-bank flagship (GO gate passed; the
# step-65k cut already reads raw nofreeze entropy gap 0.0745 at k=40 —
# under the pre-registered 0.1 bar; chi2 p still 0):
# 1. Resume the mlk64 167k schedule from step 65000 (deadline-bounded;
#    exports npz + resume tarball even if cut again).
# 2. Export npz + exact-resume tarball.
# 3. Decisive pre-registered battery (k=40, 8 formulas) on the final
#    checkpoint: uniform / diffusion_nofreeze / diffusion_mh_xor.
# 4. Solve evals tries=1 and tries=4 (pinned noise, full 2000 testset).
# 5. Tail (time permitting): vargen sweep on the k64 flagship.
#
#   nohup bash run_r3h_queue.sh > logs/r3h_queue.log 2>&1 &
set -u
cd /root/repo
BUDGET_S=${BUDGET_S:-7000}
START=$(date +%s)
left() { echo $((BUDGET_S - ($(date +%s) - START))); }

RESUME=""
for d in $(ls -dt runs_flagship/query_sat_3-sat_mlk64_*/ckpt 2>/dev/null); do
  if ls "$d" 2>/dev/null | grep -qE '^[0-9]+$'; then RESUME="$d"; break; fi
done
if [ -z "$RESUME" ]; then
  echo "no mlk64 checkpoint with a saved step; aborting"
  exit 1
fi
echo "resuming k64 flagship from $RESUME ($(date -u))"

TRAIN_S=$((BUDGET_S - 2800))   # keep ~47 min for export + battery + evals
STEPS=167000 LABEL=mlk64 CKPT="$RESUME" DEADLINE_S="$TRAIN_S" \
  STALE_S=600 EXTRA_ARGS="--label_samples 64" bash run_flagship.sh
sleep 15

K64_RUN=""
for d in $(ls -dt runs_flagship/query_sat_3-sat_mlk64_* 2>/dev/null); do
  if ls "$d/ckpt" 2>/dev/null | grep -qE '^[0-9]+$'; then K64_RUN="$d"; break; fi
done
if [ -z "$K64_RUN" ]; then
  echo "no k64 run with a saved step after training; aborting"
  exit 1
fi
latest_step=$(ls "$K64_RUN/ckpt" | grep -E '^[0-9]+$' | sort -n | tail -1)
echo "=== export k64 npz + resume tarball (step $latest_step) ($(date -u)) ==="
timeout 900 env DSAT_FORCE_CPU=1 python export_pretrained.py \
  --ckpt "$K64_RUN/ckpt" --model query_sat \
  --out pretrained/query_sat_3sat_diffusion_mlk64.npz
if [ -n "$latest_step" ]; then
  keep=$(basename "$K64_RUN")
  tar -czf pretrained/mlk64_resume.tar.gz \
    -C runs_flagship --exclude='tb' \
    "$keep/ckpt/$latest_step" "$keep/config.json" 2>/dev/null || true
fi
sleep 15

echo "=== decisive battery (k=40) on k64 flagship step $latest_step ($(date -u)) ==="
timeout 2100 python uniformity_benchmark.py --model_ckpt "$K64_RUN/ckpt" \
  --n_formulas 8 --k 40 \
  --variants uniform,diffusion_nofreeze,diffusion_mh_xor \
  --out benchmarks_mlk64_167k.jsonl \
  --summary_out UNIFORMITY_SUMMARY_MLK64_167K.json
sleep 15

if [ "$(left)" -gt 600 ]; then
  echo "=== solve eval, k64 flagship tries=1 ($(date -u)) ==="
  timeout "$(left)" python solve_eval.py --model_ckpt "$K64_RUN/ckpt" \
    --label_samples 64 --out SOLVE_EVAL_MLK64.json
  sleep 15
fi
if [ "$(left)" -gt 600 ]; then
  echo "=== solve eval, k64 flagship tries=4 ($(date -u)) ==="
  timeout "$(left)" python solve_eval.py --model_ckpt "$K64_RUN/ckpt" \
    --label_samples 64 --tries 4 --out SOLVE_EVAL_MLK64_T4.json
  sleep 15
fi

if [ "$(left)" -gt 900 ]; then
  echo "=== variable-gen sweep on k64 flagship ($(date -u)) ==="
  timeout "$(left)" python main.py --restore "$K64_RUN/ckpt" --train_steps 0 \
    --test_size 200 --evaluate_variable_gen --label mlk64_vargen \
    --train_dir runs_eval
fi

echo "=== r3h queue complete ($(date -u)) ==="
