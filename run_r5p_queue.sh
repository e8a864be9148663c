#!/bin/bash
# Round-5p queue — chained on run_r5k_queue.sh's marker. Gap-filler for
# the isolation pilot: r5k had no retry and iso02's fine-tune died on a
# transient tunnel compile error (remote_compile: response body closed,
# logs/r5k_queue.log:24). For every variant whose battery summary is
# missing: retry the fine-tune (up to 2 attempts), then battery +
# pairings.
#
#   nohup bash run_r5p_queue.sh > logs/r5p_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5k queue done' logs/r5k_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5k queue done' logs/r5k_queue.log 2>/dev/null; then
  echo "ABORT: r5k queue completion marker never appeared"; exit 1
fi

START=$(date +%s)
DEADLINE_TOTAL=${DEADLINE_TOTAL:-9000}
left() { echo $(( DEADLINE_TOTAL - ($(date +%s) - START) )); }

fill_variant() {
  local tag="$1" alpha="$2"
  local summary="UNIFORMITY_SUMMARY_${tag^^}.json"
  if [ -s "$summary" ]; then
    echo "$tag already has $summary; skipping"; return
  fi
  if [ "$(left)" -le 3600 ]; then
    echo "skipping $tag, $(left)s left"; return
  fi
  local run
  run=$(ls -dt runs_flagship/query_sat_3-sat_${tag}_*/ckpt 2>/dev/null | head -1)
  if [ -z "$run" ] || [ -z "$(ls -A "$run" 2>/dev/null)" ]; then
    for attempt in 1 2; do
      echo "=== fine-tune $tag attempt $attempt (alpha=$alpha, $(date -u)) ==="
      timeout 3600 python diffusion_training.py --train_steps 15000 \
        --train_size 60000 --test_size 2000 --label_samples 64 \
        --label_isolation_alpha "$alpha" \
        --init_npz pretrained/query_sat_3sat_diffusion_mlk64.npz \
        --initial_learning_rate 2e-4 --eval_every 2500 --ckpt_every 2500 \
        --label "$tag" --train_dir runs_flagship \
        --max_nodes_per_batch 20000 && break
      sleep 30
    done
    run=$(ls -dt runs_flagship/query_sat_3-sat_${tag}_*/ckpt 2>/dev/null | head -1)
  fi
  if [ -z "$run" ] || [ -z "$(ls -A "$run" 2>/dev/null)" ]; then
    echo "WARNING: no $tag checkpoint after retries"; return
  fi
  echo "=== battery $tag ($(date -u), $(left)s left) ==="
  timeout 2400 python uniformity_benchmark.py --model_ckpt "$run" \
    --n_formulas 8 --k 40 --variants uniform,diffusion_nofreeze \
    --out "benchmarks_${tag}_k40.jsonl" \
    --summary_out "$summary"
  sleep 15
  timeout 600 env JAX_PLATFORM_NAME=cpu python benchmarks/paired_compare.py \
    --a "benchmarks_${tag}_k40.jsonl" --b benchmarks_mlk64_final_k40.jsonl \
    --sampler diffusion_nofreeze --a_name "$tag" --b_name mlk64raw \
    --json "PAIRED_${tag^^}_VS_RAW.json" || echo "paired_compare $tag FAILED"
  timeout 600 env JAX_PLATFORM_NAME=cpu python benchmarks/solution_bias.py \
    --a "benchmarks_${tag}_k40.jsonl" --b benchmarks_mlk64_final_k40.jsonl \
    --a_variant diffusion_nofreeze --b_variant diffusion_nofreeze \
    --json "SOLUTION_BIAS_${tag^^}_VS_RAW.json" || echo "solution_bias $tag FAILED"
}

# order by value: alpha=0.55 is the extrapolated zero of the bias slope
# (iso04 moved it -0.200 -> -0.051, i.e. ~0.37 slope units per alpha
# unit -> zero at alpha ~0.55); iso02 is the dose-linearity point.
fill_variant mlk64iso055 0.55
fill_variant mlk64iso02 0.2
fill_variant mlk64isoctl 0.0

# solve-impact check: the reweighted models must keep the k64 solve rate
for tag in mlk64iso04 mlk64iso055 mlk64isoctl; do
  run=$(ls -dt runs_flagship/query_sat_3-sat_${tag}_*/ckpt 2>/dev/null | head -1)
  if [ -n "$run" ] && [ "$(left)" -gt 600 ] \
      && [ ! -s "SOLVE_EVAL_${tag^^}.json" ]; then
    echo "=== solve eval $tag tries=1 ($(date -u)) ==="
    timeout 900 python solve_eval.py --model_ckpt "$run" \
      --label_samples 64 --tries 1 --out "SOLVE_EVAL_${tag^^}.json"
    sleep 10
  fi
done
echo "=== r5p queue done ($(date -u)) ==="
