#!/bin/bash
# Round-3 TPU queue (sequential, one TPU process at a time):
# 1. wait for the k16 multi-label cache build (pid $1)
# 2. ML posterior flagship: the FULL 167k-step reference schedule with
#    16-sample uniform solution banks (--label_samples 16) — the
#    round-3 headline experiment (CLAUDE.md priority 1). DEADLINE_S
#    bounds the round's share; the run resumes across rounds from the
#    committed resume tarball (see step 3).
# 3. export portable npz + tar the orbax ckpt (full TrainState: params,
#    AdaBelief moments, step, key) into pretrained/ so the next round
#    can resume the schedule exactly even on a fresh machine.
# 4. raw-proposal battery on the ML checkpoint (uniform floor +
#    diffusion_nofreeze + refined stack) — does posterior training at
#    full scale close the cross-component gap the 8k pilot cut 3x?
# 5. multi-try solving eval (priority 5): tries=4 restarts on the ML
#    ckpt and the committed SL npz — recover solving without losing
#    diversity.
#
#   nohup bash run_r3_queue.sh <cache_pid> > logs/r3_queue.log 2>&1 &
set -u
CACHE_PID=${1:-0}
TRAIN_DEADLINE_S=${TRAIN_DEADLINE_S:-2100}
CPU_ENV="env DSAT_FORCE_CPU=1"

if [ "$CACHE_PID" -gt 0 ]; then
  echo "waiting on cache build pid $CACHE_PID ($(date -u))"
  while kill -0 "$CACHE_PID" 2>/dev/null; do sleep 10; done
fi
echo "=== cache ready; ML flagship starts ($(date -u)) ==="

RESUME=""
if [ -f pretrained/ml167k_resume.tar.gz ]; then
  # cross-round resume: unpack the committed TrainState checkpoint
  mkdir -p runs_flagship
  tar -xzf pretrained/ml167k_resume.tar.gz -C runs_flagship
  # newest run dir that actually has a saved numeric step (a stale
  # crashed-before-save dir must not win — same filter as
  # run_flagship.sh's restart loop)
  for d in $(ls -dt runs_flagship/query_sat_3-sat_ml167k_*/ckpt 2>/dev/null); do
    if ls "$d" 2>/dev/null | grep -qE '^[0-9]+$'; then RESUME="$d"; break; fi
  done
  echo "resuming ML flagship from $RESUME"
fi

STEPS=167000 LABEL=ml167k DEADLINE_S="$TRAIN_DEADLINE_S" STALE_S=420 \
  CKPT="$RESUME" EXTRA_ARGS="--label_samples 16" \
  bash run_flagship.sh
sleep 15

# newest run dir whose ckpt has a saved numeric step — an mtime-newest
# attempt that crashed pre-save must not be exported/tarred (it would
# clobber the good committed resume tarball with an empty one)
ML_RUN=""
for d in $(ls -dt runs_flagship/query_sat_3-sat_ml167k_* 2>/dev/null); do
  if ls "$d/ckpt" 2>/dev/null | grep -qE '^[0-9]+$'; then ML_RUN="$d"; break; fi
done
ML_CKPT="$ML_RUN/ckpt"
if [ -n "$ML_RUN" ] && [ -d "$ML_CKPT" ]; then
  echo "=== export ML pretrained + resume tarball from $ML_CKPT ($(date -u)) ==="
  timeout 900 $CPU_ENV python export_pretrained.py --ckpt "$ML_CKPT" \
    --model query_sat --out pretrained/query_sat_3sat_diffusion_ml.npz
  # keep only the latest orbax step in the tarball (they are small but
  # the round keeps many); repack from a trimmed copy
  latest_step=$(ls "$ML_CKPT" | grep -E '^[0-9]+$' | sort -n | tail -1)
  if [ -n "$latest_step" ]; then
    staging=$(mktemp -d)
    mkdir -p "$staging/$(basename "$ML_RUN")/ckpt"
    cp -r "$ML_CKPT/$latest_step" "$staging/$(basename "$ML_RUN")/ckpt/"
    cp "$ML_RUN"/config.json "$staging/$(basename "$ML_RUN")/" 2>/dev/null
    tar -czf pretrained/ml167k_resume.tar.gz -C "$staging" .
    rm -rf "$staging"
    echo "resume tarball: $(du -h pretrained/ml167k_resume.tar.gz)"
  else
    echo "no saved step in $ML_CKPT; keeping the committed resume tarball"
  fi

  echo "=== raw-proposal battery on the ML checkpoint ($(date -u)) ==="
  timeout 2400 python uniformity_benchmark.py --model_ckpt "$ML_CKPT" \
    --n_formulas 8 --k 10 \
    --variants uniform,diffusion_nofreeze,diffusion_mh_xor \
    --out benchmarks_ml_full.jsonl \
    --summary_out UNIFORMITY_SUMMARY_ML_FULL.json
  sleep 15

  echo "=== multi-try solving eval, ML ckpt ($(date -u)) ==="
  timeout 1800 python solve_eval.py --model_ckpt "$ML_CKPT" \
    --label_samples 16 --tries 4 --out SOLVE_EVAL_ML_T4.json
  sleep 15
fi

echo "=== multi-try solving eval, SL npz ($(date -u)) ==="
timeout 1800 python solve_eval.py \
  --model_ckpt pretrained/query_sat_3sat_diffusion.npz \
  --tries 4 --out SOLVE_EVAL_SL_T4.json

echo "=== r3 queue complete ($(date -u)) ==="
