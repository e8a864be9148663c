#!/bin/bash
# Round-5q queue — chained on run_r5o_queue.sh's marker. Generalization
# replicate of the isolation result on FRESH battery formulas (seed 1,
# not the pre-registered seed-0 set): iso055 and the 167k baseline,
# paired, to show slope ~0 vs ~-0.2 holds beyond the formulas the dose
# was tuned on.
#
#   nohup bash run_r5q_queue.sh > logs/r5q_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5o queue done' logs/r5o_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5o queue done' logs/r5o_queue.log 2>/dev/null; then
  echo "ABORT: r5o queue completion marker never appeared"; exit 1
fi
ISO=$(ls -dt runs_flagship/query_sat_3-sat_mlk64iso055_*/ckpt 2>/dev/null | head -1)
BASE=runs_flagship/query_sat_3-sat_mlk64_20260819_231652/ckpt
if [ -z "$ISO" ]; then echo "no iso055 ckpt; abort"; exit 1; fi
echo "=== seed-1 battery: iso055 ($(date -u)) ==="
timeout 2400 python uniformity_benchmark.py --model_ckpt "$ISO" \
  --n_formulas 8 --k 40 --seed 1 --variants uniform,diffusion_nofreeze \
  --out benchmarks_mlk64iso055_s1_k40.jsonl \
  --summary_out UNIFORMITY_SUMMARY_MLK64ISO055_S1.json
sleep 15
echo "=== seed-1 battery: 167k baseline ($(date -u)) ==="
timeout 2400 python uniformity_benchmark.py --model_ckpt "$BASE" \
  --n_formulas 8 --k 40 --seed 1 --variants diffusion_nofreeze \
  --out benchmarks_mlk64_s1_k40.jsonl \
  --summary_out UNIFORMITY_SUMMARY_MLK64_S1.json
sleep 15
timeout 600 env JAX_PLATFORM_NAME=cpu python benchmarks/solution_bias.py \
  --a benchmarks_mlk64iso055_s1_k40.jsonl --b benchmarks_mlk64_s1_k40.jsonl \
  --a_variant diffusion_nofreeze --b_variant diffusion_nofreeze \
  --json SOLUTION_BIAS_ISO055_VS_BASE_S1.json || echo "bias pairing FAILED"
echo "=== r5q queue done ($(date -u)) ==="
