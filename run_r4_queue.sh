#!/bin/bash
# Round-4 queue — finish the k64-bank flagship (gate GO at step 65k:
# raw nofreeze entropy gap 0.0745 at k=40, under the pre-registered 0.1
# bar; chi2 p still 0 at that cut) and take the decisive readings:
# 1. Resume the mlk64 167k schedule from the committed step-65000
#    tarball (deadline-bounded; restart loop handles tunnel stalls).
# 2. Export npz + exact-resume tarball at whatever step the deadline
#    allows (cross-round resume stays intact either way).
# 3. Decisive pre-registered battery (k=40, 8 formulas):
#    uniform / diffusion_nofreeze / diffusion_mh_xor.
# 4. Solve evals tries=1 / tries=4 (pinned noise, full 2000 testset).
# 5. Paired raw-sampler comparison vs the k16 ML 167k checkpoint.
#
#   nohup bash run_r4_queue.sh > logs/r4_queue.log 2>&1 &
set -u
cd /root/repo
BUDGET_S=${BUDGET_S:-5700}
TAIL_S=${TAIL_S:-2700}          # export + battery + evals reserve
START=$(date +%s)
left() { echo $((BUDGET_S - ($(date +%s) - START))); }

# wait for the k64 cache rebuild (jax-free, launched separately)
for i in $(seq 1 60); do
  if [ -f .cache_3sat_k64_done ] || grep -q 'test ok' logs/cache_k64_r4.log 2>/dev/null; then break; fi
  sleep 15
done

RESUME=""
for d in $(ls -dt runs_flagship/query_sat_3-sat_mlk64_*/ckpt 2>/dev/null); do
  if ls "$d" 2>/dev/null | grep -qE '^[0-9]+$'; then RESUME="$d"; break; fi
done
if [ -z "$RESUME" ]; then
  echo "no mlk64 checkpoint with a saved step; aborting"
  exit 1
fi
echo "resuming k64 flagship from $RESUME ($(date -u))"

TRAIN_S=$((BUDGET_S - TAIL_S))
STEPS=167000 LABEL=mlk64 CKPT="$RESUME" DEADLINE_S="$TRAIN_S" \
  STALE_S=600 EXTRA_ARGS="--label_samples 64" bash run_flagship.sh
sleep 15

K64_RUN=""
for d in $(ls -dt runs_flagship/query_sat_3-sat_mlk64_* 2>/dev/null); do
  if ls "$d/ckpt" 2>/dev/null | grep -qE '^[0-9]+$'; then K64_RUN="${d%/}"; break; fi
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

if [ "$(left)" -gt 500 ]; then
  echo "=== solve eval, k64 flagship tries=1 ($(date -u)) ==="
  timeout "$(left)" python solve_eval.py --model_ckpt "$K64_RUN/ckpt" \
    --label_samples 64 --out SOLVE_EVAL_MLK64.json
  sleep 15
fi
if [ "$(left)" -gt 400 ]; then
  echo "=== solve eval, k64 flagship tries=4 ($(date -u)) ==="
  timeout "$(left)" python solve_eval.py --model_ckpt "$K64_RUN/ckpt" \
    --label_samples 64 --tries 4 --out SOLVE_EVAL_MLK64_T4.json
  sleep 15
fi

if [ -f benchmarks_mlk64_167k.jsonl ]; then
  echo "=== paired raw-sampler compare: k64 vs k16 ML167k ($(date -u)) ==="
  timeout 300 env DSAT_FORCE_CPU=1 python benchmarks/paired_compare.py \
    --a benchmarks_mlk64_167k.jsonl --b benchmarks_ml_full.jsonl \
    --a_name mlk64 --b_name mlk16 --out PAIRED_MLK64_MLK16.json || true
fi
echo "=== r4 queue done ($(date -u)) ==="
