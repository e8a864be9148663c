#!/bin/bash
# Round-5k queue — chained on run_r5n_queue.sh's completion marker.
# Isolation-weighted label-selection pilot (the anti-basin-volume
# training lever, UNIFORMITY_ANALYSIS.md): fine-tune the k64 flagship
# 15k steps at alpha in {0.2, 0.4} plus an alpha=0 control (same extra
# steps, no reweighting), run the k=40 raw battery on each, and pair
# against the committed 167k baseline battery.
#
#   nohup bash run_r5k_queue.sh > logs/r5k_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5n queue done' logs/r5n_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5n queue done' logs/r5n_queue.log 2>/dev/null; then
  echo "ABORT: r5n queue completion marker never appeared"; exit 1
fi

START=$(date +%s)
DEADLINE_TOTAL=${DEADLINE_TOTAL:-10800}
left() { echo $(( DEADLINE_TOTAL - ($(date +%s) - START) )); }

run_variant() {
  local tag="$1" alpha="$2"
  if [ "$(left)" -le 3900 ]; then
    echo "skipping $tag, $(left)s left"; return
  fi
  echo "=== fine-tune $tag (alpha=$alpha, $(date -u), $(left)s left) ==="
  timeout 3600 python diffusion_training.py --train_steps 15000 \
    --train_size 60000 --test_size 2000 --label_samples 64 \
    --label_isolation_alpha "$alpha" \
    --init_npz pretrained/query_sat_3sat_diffusion_mlk64.npz \
    --initial_learning_rate 2e-4 --eval_every 2500 --ckpt_every 2500 \
    --label "$tag" --train_dir runs_flagship --max_nodes_per_batch 20000
  sleep 15
  local run
  run=$(ls -dt runs_flagship/query_sat_3-sat_${tag}_*/ckpt 2>/dev/null | head -1)
  if [ -z "$run" ]; then
    echo "WARNING: no $tag checkpoint; skipping battery"; return
  fi
  echo "=== battery $tag ($(date -u), $(left)s left) ==="
  timeout 2400 python uniformity_benchmark.py --model_ckpt "$run" \
    --n_formulas 8 --k 40 --variants uniform,diffusion_nofreeze \
    --out "benchmarks_${tag}_k40.jsonl" \
    --summary_out "UNIFORMITY_SUMMARY_${tag^^}.json"
  sleep 15
  # host-side pairings vs the committed 167k baseline battery
  timeout 600 env JAX_PLATFORM_NAME=cpu python benchmarks/paired_compare.py \
    --a "benchmarks_${tag}_k40.jsonl" --b benchmarks_mlk64_final_k40.jsonl \
    --sampler diffusion_nofreeze --a_name "$tag" --b_name mlk64raw \
    --json "PAIRED_${tag^^}_VS_RAW.json" || echo "paired_compare $tag FAILED"
  timeout 600 env JAX_PLATFORM_NAME=cpu python benchmarks/solution_bias.py \
    --a "benchmarks_${tag}_k40.jsonl" --b benchmarks_mlk64_final_k40.jsonl \
    --a_variant diffusion_nofreeze --b_variant diffusion_nofreeze \
    --json "SOLUTION_BIAS_${tag^^}_VS_RAW.json" || true
}

run_variant mlk64iso02 0.2
run_variant mlk64iso04 0.4
run_variant mlk64isoctl 0.0
echo "=== r5k queue done ($(date -u)) ==="
