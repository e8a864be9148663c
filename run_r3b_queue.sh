#!/bin/bash
# Round-3b TPU queue (sequential, one TPU process at a time) — the
# decisive round-3 experiments, run after run_r3_tail.sh completed:
#
# 1. ML posterior flagship: FINISH the 167k schedule (resume from the
#    newest saved step, currently 54k). Remaining ~113k steps ≈ 56 min
#    at 33.9 steps/s; DEADLINE_S leaves headroom for compile+restarts.
# 2. Export portable npz + retar the exact-resume TrainState.
# 3. DECISIVE raw-uniformity battery on the FINAL checkpoint.
#    PRE-REGISTERED design (VERDICT round-2 weak #6: no more ambiguous
#    small-sample tables):
#      - k=40 -> ~40*n_solutions samples per formula (~840 at 21 sols),
#        4x the round-2 battery;
#      - 8 formulas, variants: exact-uniform floor, diffusion_nofreeze
#        (raw sampler: no MH, no freeze), diffusion_mh_xor (refined);
#      - decision rule (VERDICT "Next round" #1): raw sampler passes iff
#        its median chi2_p is within the uniform floor's range (~0.5)
#        AND mean entropy gap <= 0.1. Otherwise commit the negative
#        result + analysis.
# 4. Solving evals on the final ML ckpt (tries=1 and tries=4) + the 54k
#    ML npz (tries=1) for the solve-vs-diversity checkpoint chain.
# 5. Paired cross-checkpoint comparisons (ml167k vs sl167k, vs ml54k).
# 6. ANF multi-try eval (tries=4) on the finished 130k ANF model —
#    the documented systems-solved lever (VERDICT "Next round" #7).
# 7. Final bench with the fine-block default.
#
#   nohup bash run_r3b_queue.sh > logs/r3b_queue.log 2>&1 &
set -u
CPU_ENV="env DSAT_FORCE_CPU=1"
TRAIN_DEADLINE_S=${TRAIN_DEADLINE_S:-7200}

pick_resume() {
  for d in $(ls -dt runs_flagship/query_sat_3-sat_ml167k_*/ckpt 2>/dev/null); do
    if ls "$d" 2>/dev/null | grep -qE '^[0-9]+$'; then echo "$d"; return; fi
  done
}

RESUME=$(pick_resume)
if [ -z "$RESUME" ] && [ -f pretrained/ml167k_resume.tar.gz ]; then
  mkdir -p runs_flagship
  tar -xzf pretrained/ml167k_resume.tar.gz -C runs_flagship
  RESUME=$(pick_resume)
fi
echo "=== ML flagship: resume from ${RESUME:-scratch} ($(date -u)) ==="

# DSAT_FINE_BLOCKS=0 for THIS resume: the coarse-shape XLA programs are
# already in the server-side persistent cache from the original run —
# fine blocks (now the repo default) would pay ~15 fresh multi-minute
# shape compiles against a 7-min stale watchdog. STALE_S raised anyway
# so a first-step compile can't be mistaken for a hang.
STEPS=167000 LABEL=ml167k DEADLINE_S="$TRAIN_DEADLINE_S" STALE_S=900 \
  CKPT="$RESUME" EXTRA_ARGS="--label_samples 16" DSAT_FINE_BLOCKS=0 \
  bash run_flagship.sh
sleep 15

# newest run dir whose ckpt actually has a saved numeric step
ML_RUN=""
for d in $(ls -dt runs_flagship/query_sat_3-sat_ml167k_* 2>/dev/null); do
  if ls "$d/ckpt" 2>/dev/null | grep -qE '^[0-9]+$'; then ML_RUN="$d"; break; fi
done
ML_CKPT="$ML_RUN/ckpt"
if [ -n "$ML_RUN" ] && [ -d "$ML_CKPT" ]; then
  echo "=== export ML pretrained + resume tarball from $ML_CKPT ($(date -u)) ==="
  timeout 900 $CPU_ENV python export_pretrained.py --ckpt "$ML_CKPT" \
    --model query_sat --out pretrained/query_sat_3sat_diffusion_ml167k.npz
  latest_step=$(ls "$ML_CKPT" | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -n "$latest_step" ]; then
    staging=$(mktemp -d)
    mkdir -p "$staging/$(basename "$ML_RUN")/ckpt"
    cp -r "$ML_CKPT/$latest_step" "$staging/$(basename "$ML_RUN")/ckpt/"
    cp "$ML_RUN"/config.json "$staging/$(basename "$ML_RUN")/" 2>/dev/null
    tar -czf pretrained/ml167k_resume.tar.gz -C "$staging" .
    rm -rf "$staging"
    echo "resume tarball updated at step $latest_step"
  fi

  echo "=== DECISIVE battery on final ML ckpt, pre-registered k=40 ($(date -u)) ==="
  timeout 10800 python uniformity_benchmark.py --model_ckpt "$ML_CKPT" \
    --n_formulas 8 --k 40 \
    --variants uniform,diffusion_nofreeze,diffusion_mh_xor \
    --out benchmarks_ml167k.jsonl \
    --summary_out UNIFORMITY_SUMMARY_ML167K.json
  sleep 15

  echo "=== solve eval, final ML ckpt tries=1 ($(date -u)) ==="
  timeout 2400 python solve_eval.py --model_ckpt "$ML_CKPT" \
    --label_samples 16 --out SOLVE_EVAL_ML167K.json
  sleep 15
  echo "=== solve eval, final ML ckpt tries=4 ($(date -u)) ==="
  timeout 2400 python solve_eval.py --model_ckpt "$ML_CKPT" \
    --label_samples 16 --tries 4 --out SOLVE_EVAL_ML167K_T4.json
  sleep 15
fi

echo "=== solve eval, ML 54k npz tries=1 (checkpoint chain) ($(date -u)) ==="
timeout 2400 python solve_eval.py \
  --model_ckpt pretrained/query_sat_3sat_diffusion_ml.npz \
  --label_samples 16 --out SOLVE_EVAL_ML54K.json
sleep 15

echo "=== ANF multi-try eval, 130k model, tries=4 ($(date -u)) ==="
timeout 3600 python anf_eval.py --ckpt pretrained/anf_sat_sha1_r17_130k.npz \
  --tries 4 --out ANF_EVAL_130K_T4.json
sleep 15

echo "=== paired compares (CPU) ($(date -u)) ==="
timeout 600 $CPU_ENV python benchmarks/paired_compare.py \
  --a benchmarks_ml167k.jsonl --b benchmarks_live_xor.jsonl \
  --a_name ml167k --b_name sl167k --json PAIRED_ML167K_SL.json || true
timeout 600 $CPU_ENV python benchmarks/paired_compare.py \
  --a benchmarks_ml167k.jsonl --b benchmarks_ml_full.jsonl \
  --a_name ml167k --b_name ml54k --json PAIRED_ML167K_ML54K.json || true

echo "=== final bench, fine-block default ($(date -u)) ==="
timeout 2400 python bench.py | tee BENCH_SELF_r03b.json

echo "=== r3b queue complete ($(date -u)) ==="
