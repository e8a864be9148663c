#!/bin/bash
# Round-3g queue — fresh machine #4, resumes the interrupted r3e/r3f plan:
# 0. Wait for the dataset-cache rebuilds (jax-free), then the CPU test
#    suite (sequenced BEFORE any TPU client per CLAUDE.md).
# 1. Headline bench at defaults (block-bf16 + fine blocks): the clean
#    sorted-stream bf16 reading that decides whether the default stays,
#    and warms the persistent compile cache for the round-end driver bench.
# 2. f32 headline bench (DSAT_BLOCK_BF16=0) for the paired comparison.
# 3. k64 bank-size pilot (8k steps, f32 to match the k16 pilot) + nofreeze
#    battery -> gate (hypothesis (b): 16-sample banks under-represent
#    18-24-solution sets).
# 4. Temperature sweep on the finished ML167k checkpoint (pure eval;
#    hypothesis (a) lever: per-step commitment calibration).
# 5. Gate GO -> k64 flagship (deadline-bounded; exports npz + resume
#    tarball even if the schedule is cut) + pre-registered battery +
#    solve evals. STOP -> hypothesis-(c) pilot (noise_skew=2) + battery.
# 6. Tail (time permitting): vargen/batchgen/invariance sweeps on the
#    ML167k flagship (restored from the committed resume tarball).
#
#   nohup bash run_r3g_queue.sh <k16_pid> <k64_pid> > logs/r3g_queue.log 2>&1 &
set -u
cd /root/repo
K16_PID=${1:?usage: run_r3g_queue.sh <k16_pid> <k64_pid>}
K64_PID=${2:?usage: run_r3g_queue.sh <k16_pid> <k64_pid>}
BUDGET_S=${BUDGET_S:-9000}
START=$(date +%s)
left() { echo $((BUDGET_S - ($(date +%s) - START))); }

echo "waiting on cache builders $K16_PID $K64_PID ($(date -u))"
while kill -0 "$K16_PID" 2>/dev/null || kill -0 "$K64_PID" 2>/dev/null; do
  sleep 15
done
ls -la data_cache/ || true

echo "=== CPU test suite ($(date -u)) ==="
timeout 1200 python -m pytest tests/ -q 2>&1 | tail -5 | tee logs/pytest_r3g.log
sleep 10

echo "=== headline bench, defaults (block-bf16 + fine blocks) ($(date -u)) ==="
timeout 3600 python bench.py | tee BENCH_BF16_r03b.json
sleep 15
echo "=== headline bench, f32 (DSAT_BLOCK_BF16=0) ($(date -u)) ==="
timeout 2400 env DSAT_BLOCK_BF16=0 python bench.py | tee BENCH_SELF_r03d.json
sleep 15

echo "=== train ML k64 bank, 8k steps (same schedule as k16 pilot) ($(date -u)) ==="
timeout 3000 env DSAT_BLOCK_BF16=0 python diffusion_training.py \
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

GATE=$(python - <<'EOF'
import json
try:
    base, new = {}, {}
    for fn, d in (("benchmarks_ml8k.jsonl", base),
                  ("benchmarks_ml8k_rest.jsonl", base),
                  ("benchmarks_ml8k_k64.jsonl", new)):
        for line in open(fn):
            r = json.loads(line)
            if "diffusion_nofreeze" in r:
                s = r["diffusion_nofreeze"]
                d[r["formula"]] = s["uniform_entropy"] - s["count_entropy"]
    common = sorted(set(base) & set(new))
    bm = sum(base[k] for k in common) / len(common)
    nm = sum(new[k] for k in common) / len(common)
    print(f"gate: k16 gap {bm:.4f} vs k64 gap {nm:.4f} on {len(common)} matched formulas")
    print("GO" if nm <= 0.8 * bm else "STOP")
except Exception as e:
    print(f"gate error: {e}")
    print("STOP")
EOF
)
echo "$GATE"

echo "=== temperature sweep on ML167k (pure eval) ($(date -u)) ==="
timeout 4500 python uniformity_benchmark.py \
  --model_ckpt pretrained/query_sat_3sat_diffusion_ml167k.npz \
  --n_formulas 8 --k 10 \
  --variants uniform,diffusion_sample,diffusion_nofreeze_t1.25,diffusion_nofreeze_t1.1,diffusion_nofreeze_t0.8 \
  --out benchmarks_temp_sweep.jsonl \
  --summary_out UNIFORMITY_SUMMARY_TEMP.json
sleep 15

if echo "$GATE" | grep -q '^GO$'; then
  L=$(left)
  # the flagship is worth starting with >=25 min: partial k64 schedules
  # already move the gap (54k read 0.153), and the resume tarball hands
  # round 4 an exact continuation either way.
  if [ "$L" -gt 1500 ]; then
    TRAIN_S=$((L - 1500))   # keep ~25 min for export + battery/evals
    echo "=== k64 flagship GO: 167k schedule, deadline ${TRAIN_S}s ($(date -u)) ==="
    STEPS=167000 LABEL=mlk64 DEADLINE_S="$TRAIN_S" STALE_S=600 \
      EXTRA_ARGS="--label_samples 64" bash run_flagship.sh
    sleep 15
    K64_RUN=""
    for d in $(ls -dt runs_flagship/query_sat_3-sat_mlk64_* 2>/dev/null); do
      if ls "$d/ckpt" 2>/dev/null | grep -qE '^[0-9]+$'; then K64_RUN="$d"; break; fi
    done
    if [ -n "$K64_RUN" ]; then
      echo "=== export k64 npz + resume tarball ($(date -u)) ==="
      timeout 900 env DSAT_FORCE_CPU=1 python export_pretrained.py \
        --ckpt "$K64_RUN/ckpt" --model query_sat \
        --out pretrained/query_sat_3sat_diffusion_mlk64.npz
      latest_step=$(ls "$K64_RUN/ckpt" | grep -E '^[0-9]+$' | sort -n | tail -1)
      if [ -n "$latest_step" ]; then
        keep=$(basename "$K64_RUN")
        tar -czf pretrained/mlk64_resume.tar.gz \
          -C runs_flagship --exclude='tb' \
          "$keep/ckpt/$latest_step" "$keep/config.json" 2>/dev/null || true
      fi
      echo "=== decisive battery (k=40) on k64 flagship ($(date -u)) ==="
      timeout "$(left)" python uniformity_benchmark.py --model_ckpt "$K64_RUN/ckpt" \
        --n_formulas 8 --k 40 \
        --variants uniform,diffusion_nofreeze,diffusion_mh_xor \
        --out benchmarks_mlk64_167k.jsonl \
        --summary_out UNIFORMITY_SUMMARY_MLK64_167K.json
      sleep 15
      if [ "$(left)" -gt 1200 ]; then
        echo "=== solve eval, k64 flagship tries=1 ($(date -u)) ==="
        timeout 2400 python solve_eval.py --model_ckpt "$K64_RUN/ckpt" \
          --label_samples 64 --out SOLVE_EVAL_MLK64.json
      fi
    fi
  else
    echo "=== GO but only ${L}s left; skipping flagship ==="
  fi
else
  echo "=== k64 gate STOP: hypothesis-(c) pilot (noise_skew=2, k16, 8k steps, f32) ($(date -u)) ==="
  timeout 2400 env DSAT_BLOCK_BF16=0 python diffusion_training.py \
    --train_steps 8000 --label_samples 16 --noise_skew 2.0 \
    --label ml8k_skew2 --train_dir runs_ml \
    --eval_every 4000 --ckpt_every 4000
  sleep 15
  SKEW_CKPT=$(ls -dt runs_ml/*ml8k_skew2*/ckpt 2>/dev/null | head -1)
  if [ -n "$SKEW_CKPT" ]; then
    echo "=== nofreeze battery: noise_skew=2 checkpoint ($(date -u)) ==="
    timeout 1800 python uniformity_benchmark.py --model_ckpt "$SKEW_CKPT" \
      --n_formulas 8 --k 10 --variants uniform,diffusion_nofreeze \
      --out benchmarks_ml8k_skew2.jsonl \
      --summary_out UNIFORMITY_SUMMARY_ML8K_SKEW2.json
  fi
fi

# tail: reference main.py eval sweeps on the ML167k flagship, from the
# committed resume tarball (runs_flagship is gone on this fresh machine)
if [ "$(left)" -gt 1500 ]; then
  mkdir -p runs_flagship
  tar -xzf pretrained/ml167k_resume.tar.gz -C runs_flagship 2>/dev/null || true
  ML_CKPT=$(ls -dt runs_flagship/query_sat_3-sat_ml167k_*/ckpt 2>/dev/null | head -1)
  if [ -n "$ML_CKPT" ]; then
    echo "=== variable-gen sweep on ML167k flagship ($(date -u)) ==="
    timeout "$(left)" python main.py --restore "$ML_CKPT" --train_steps 0 \
      --test_size 200 --evaluate_variable_gen --label ml_vargen \
      --train_dir runs_eval
    sleep 15
    if [ "$(left)" -gt 900 ]; then
      echo "=== batch-size-gen sweep on ML167k flagship ($(date -u)) ==="
      timeout "$(left)" python main.py --restore "$ML_CKPT" --train_steps 0 \
        --test_size 200 --evaluate_batch_gen --label ml_batchgen \
        --train_dir runs_eval
      sleep 15
    fi
    if [ "$(left)" -gt 900 ]; then
      echo "=== invariance test on ML167k flagship ($(date -u)) ==="
      timeout "$(left)" python main.py --restore "$ML_CKPT" --train_steps 0 \
        --test_size 200 --test_invariance --label ml_invariance \
        --train_dir runs_eval
    fi
  fi
fi

echo "=== r3g queue complete ($(date -u)) ==="
