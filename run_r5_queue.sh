#!/bin/bash
# Round-5 queue — the decisive uniformity artifacts (VERDICT r3 item 1).
# Strictly serial TPU use: every device-touching step runs in sequence in
# THIS script; nothing else may touch the axon client while it runs.
# Chain follow-up work on the literal marker line 'r5 queue done' in
# logs/r5_queue.log (ADVICE r3: never chain on PIDs).
#
# 1. Resume the mlk64 167k schedule from the on-disk step-94000 checkpoint
#    and run it to completion (~73k steps ~= 32 min at 38.9 steps/s).
# 2. Export npz + VERIFIED exact-resume tarball.
# 3. Decisive pre-registered battery (k=40, 8 formulas) on the FINAL
#    checkpoint: uniform / diffusion_nofreeze / diffusion_mh_xor.
# 4. Same battery at k=10 (like-for-like pairing vs benchmarks_ml_full.jsonl,
#    which was collected at k=10 — ADVICE r3 medium).
# 5. k16 ML167k baseline battery at k=40 (like-for-like for the k=40 pairing).
# 6. Solve evals tries=1 / tries=4 on the final k64 checkpoint.
# 7. Paired comparisons (CPU, --json — the real flag; ADVICE r3 medium).
#
#   nohup bash run_r5_queue.sh > logs/r5_queue.log 2>&1 &
set -u
cd /root/repo
BUDGET_S=${BUDGET_S:-14400}
START=$(date +%s)
left() { echo $((BUDGET_S - ($(date +%s) - START))); }

# sanity: the k64 cache must exist (jax-free rebuild takes ~3 min if not)
if ! ls data_cache/diffusion_3sat_3_30_60000_k64_train_*.npz >/dev/null 2>&1; then
  echo "=== k64 cache missing; rebuilding (jax-free) ($(date -u)) ==="
  timeout 900 python build_3sat_cache.py --label_samples 64
  if ! ls data_cache/diffusion_3sat_3_30_60000_k64_train_*.npz >/dev/null 2>&1; then
    echo "ABORT: k64 cache rebuild failed"; exit 1
  fi
fi

RESUME=""
for d in $(ls -dt runs_flagship/query_sat_3-sat_mlk64_*/ckpt 2>/dev/null); do
  if ls "$d" 2>/dev/null | grep -qE '^[0-9]+$'; then RESUME="$d"; break; fi
done
if [ -z "$RESUME" ]; then
  # fresh machine: unpack the committed resume tarball (full TrainState @94k)
  echo "=== unpacking pretrained/mlk64_resume.tar.gz ($(date -u)) ==="
  mkdir -p runs_flagship
  tar -xzf pretrained/mlk64_resume.tar.gz -C runs_flagship
  for d in $(ls -dt runs_flagship/query_sat_3-sat_mlk64_*/ckpt 2>/dev/null); do
    if ls "$d" 2>/dev/null | grep -qE '^[0-9]+$'; then RESUME="$d"; break; fi
  done
fi
if [ -z "$RESUME" ]; then
  echo "ABORT: no mlk64 checkpoint with a saved step"; exit 1
fi
start_step=$(ls "$RESUME" | grep -E '^[0-9]+$' | sort -n | tail -1)
echo "=== resuming k64 flagship from $RESUME step $start_step ($(date -u)) ==="

TRAIN_S=5400
if [ "$(left)" -lt "$TRAIN_S" ]; then TRAIN_S=$(left); fi
STEPS=167000 LABEL=mlk64 CKPT="$RESUME" DEADLINE_S="$TRAIN_S" \
  STALE_S=600 EXTRA_ARGS="--label_samples 64" bash run_flagship.sh
sleep 15

K64_RUN=""
for d in $(ls -dt runs_flagship/query_sat_3-sat_mlk64_* 2>/dev/null); do
  if ls "$d/ckpt" 2>/dev/null | grep -qE '^[0-9]+$'; then K64_RUN="${d%/}"; break; fi
done
if [ -z "$K64_RUN" ]; then echo "ABORT: no k64 run with a saved step"; exit 1; fi
latest_step=$(ls "$K64_RUN/ckpt" | grep -E '^[0-9]+$' | sort -n | tail -1)
echo "=== export k64 npz + resume tarball (step $latest_step) ($(date -u)) ==="
timeout 900 env DSAT_FORCE_CPU=1 python export_pretrained.py \
  --ckpt "$K64_RUN/ckpt" --model query_sat \
  --out pretrained/query_sat_3sat_diffusion_mlk64.npz
# verified tarball: build to a temp path, check contents, then replace
# (ADVICE r3 low: never silently overwrite the cross-round resume artifact)
if [ -n "$latest_step" ]; then
  keep=$(basename "$K64_RUN")
  tmp_tar=pretrained/.mlk64_resume.tmp.tar.gz
  if tar -czf "$tmp_tar" -C runs_flagship --exclude='tb' \
       "$keep/ckpt/$latest_step" "$keep/config.json" \
     && tar -tzf "$tmp_tar" | grep -q "ckpt/$latest_step/"; then
    mv "$tmp_tar" pretrained/mlk64_resume.tar.gz
    echo "resume tarball verified (step $latest_step)"
  else
    rm -f "$tmp_tar"
    echo "WARNING: resume tarball creation FAILED; committed artifact untouched"
  fi
fi
sleep 15

echo "=== decisive battery (k=40) on k64 flagship step $latest_step ($(date -u)) ==="
timeout 3600 python uniformity_benchmark.py --model_ckpt "$K64_RUN/ckpt" \
  --n_formulas 8 --k 40 \
  --variants uniform,diffusion_nofreeze,diffusion_mh_xor \
  --out benchmarks_mlk64_final_k40.jsonl \
  --summary_out UNIFORMITY_SUMMARY_MLK64_FINAL.json
sleep 15

if [ "$(left)" -gt 2400 ]; then
  echo "=== battery (k=10) on k64 flagship, like-for-like vs ml_full ($(date -u)) ==="
  timeout 1800 python uniformity_benchmark.py --model_ckpt "$K64_RUN/ckpt" \
    --n_formulas 8 --k 10 \
    --variants uniform,diffusion_nofreeze \
    --out benchmarks_mlk64_final_k10.jsonl \
    --summary_out UNIFORMITY_SUMMARY_MLK64_K10.json
  sleep 15
else
  echo "SKIPPED k=10 battery: $(left)s left"
fi

if [ "$(left)" -gt 2400 ]; then
  echo "=== k16 ML167k baseline battery at k=40 (like-for-like) ($(date -u)) ==="
  timeout 1800 python uniformity_benchmark.py \
    --model_ckpt pretrained/query_sat_3sat_diffusion_ml167k.npz \
    --n_formulas 8 --k 40 \
    --variants uniform,diffusion_nofreeze \
    --out benchmarks_ml167k_k40.jsonl \
    --summary_out UNIFORMITY_SUMMARY_ML167K_K40.json
  sleep 15
else
  echo "SKIPPED k16@k40 baseline battery: $(left)s left"
fi

if [ "$(left)" -gt 1800 ]; then
  echo "=== solve eval, k64 flagship tries=1 ($(date -u)) ==="
  timeout 1500 python solve_eval.py --model_ckpt "$K64_RUN/ckpt" \
    --label_samples 64 --out SOLVE_EVAL_MLK64.json
  sleep 15
else
  echo "SKIPPED solve eval tries=1: $(left)s left"
fi
if [ "$(left)" -gt 2400 ]; then
  echo "=== solve eval, k64 flagship tries=4 ($(date -u)) ==="
  timeout 2100 python solve_eval.py --model_ckpt "$K64_RUN/ckpt" \
    --label_samples 64 --tries 4 --out SOLVE_EVAL_MLK64_T4.json
  sleep 15
else
  echo "SKIPPED solve eval tries=4: $(left)s left"
fi

# paired comparisons are CPU-only (no device use)
if [ -f benchmarks_mlk64_final_k10.jsonl ]; then
  echo "=== paired compare: k64(k10) vs k16 ML167k(k10) ($(date -u)) ==="
  timeout 300 env DSAT_FORCE_CPU=1 python benchmarks/paired_compare.py \
    --a benchmarks_mlk64_final_k10.jsonl --b benchmarks_ml_full.jsonl \
    --a_name mlk64 --b_name mlk16 --json PAIRED_MLK64_MLK16_K10.json \
    || echo "WARNING: paired compare k10 FAILED"
fi
if [ -f benchmarks_mlk64_final_k40.jsonl ] && [ -f benchmarks_ml167k_k40.jsonl ]; then
  echo "=== paired compare: k64(k40) vs k16 ML167k(k40) ($(date -u)) ==="
  timeout 300 env DSAT_FORCE_CPU=1 python benchmarks/paired_compare.py \
    --a benchmarks_mlk64_final_k40.jsonl --b benchmarks_ml167k_k40.jsonl \
    --a_name mlk64 --b_name mlk16 --json PAIRED_MLK64_MLK16_K40.json \
    || echo "WARNING: paired compare k40 FAILED"
fi
echo "=== r5 queue done ($(date -u)) ==="
