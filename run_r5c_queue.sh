#!/bin/bash
# Round-5c queue — perf + remaining VERDICT items on the freed TPU, after
# run_r5_queue.sh printed its 'r5 queue done' marker (checked here, not
# chained on a PID — ADVICE r3).
# 1. Temperature-calibration battery on the FINAL k64 checkpoint (the one
#    cheap lever left for raw-sampler uniformity before writing the
#    negative-result analysis).
# 2. bench.py at the default 20k node budget under the new median-of-5
#    protocol -> BENCH_SELF_r05.json.
# 3. bench.py at the 60k budget (reference README.md:28 "for more
#    advanced cards") -> BENCH_60K.json, superseding the stale coarse-
#    block reading (VERDICT r3 item 2). First run pays fresh shape
#    compiles (minutes each, persistent-cached).
# 4. Flat-path real workloads: SHA-1 CNF + SATLIB-scale, XLA vs Pallas
#    (VERDICT r3 item 5) -> BENCH_FLAT_PALLAS.json.
# 5. TPE study at reference scale: 50 trials (VERDICT r3 item 7).
# 6. ANF round-scaling eval at 256 rounds + error-structure/CDCL
#    completion at 256 rounds on the TPU (VERDICT r3 item 4).
#
#   nohup bash run_r5c_queue.sh > logs/r5c_queue.log 2>&1 &
set -u
cd /root/repo
K64_CKPT=runs_flagship/query_sat_3-sat_mlk64_20260819_231652/ckpt

# wait for the r5 queue's completion marker (up to 2h), abort loudly if
# it never appears
for i in $(seq 1 480); do
  grep -q 'r5 queue done' logs/r5_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5 queue done' logs/r5_queue.log 2>/dev/null; then
  echo "ABORT: r5 queue completion marker never appeared"; exit 1
fi

echo "=== temp-calibration battery (k=40) on k64 final ($(date -u)) ==="
timeout 2700 python uniformity_benchmark.py --model_ckpt "$K64_CKPT" \
  --n_formulas 8 --k 40 \
  --variants diffusion_nofreeze_t1.05,diffusion_nofreeze_t1.1,diffusion_nofreeze_t1.2 \
  --out benchmarks_mlk64_temp.jsonl \
  --summary_out UNIFORMITY_SUMMARY_MLK64_TEMP.json
sleep 15

echo "=== bench 20k, median-of-5 protocol ($(date -u)) ==="
timeout 1800 python bench.py | tee BENCH_SELF_r05.json
sleep 15

echo "=== bench 60k node budget ($(date -u)) ==="
timeout 5400 env DSAT_BENCH_NODES=60000 python bench.py | tee BENCH_60K_NEW.json
if [ -s BENCH_60K_NEW.json ] && grep -q 'train_edge_throughput' BENCH_60K_NEW.json; then
  mv BENCH_60K_NEW.json BENCH_60K.json
  echo "BENCH_60K.json superseded with current-stack reading"
else
  echo "WARNING: 60k bench failed; stale BENCH_60K.json left in place"
fi
sleep 15

echo "=== flat-path real workloads: SHA-1 + SATLIB, XLA vs Pallas ($(date -u)) ==="
timeout 3600 python benchmarks/bench_flat_pallas.py --out BENCH_FLAT_PALLAS.json
sleep 15

echo "=== TPE study, 50 trials ($(date -u)) ==="
timeout 5400 python hyperopt.py --trials 50 --steps_per_trial 500 \
  --out HYPEROPT_TPU_50.jsonl
sleep 15

echo "=== ANF eval at 256 rounds ($(date -u)) ==="
timeout 2700 python anf_eval.py --ckpt pretrained/anf_sat_sha1_r17_130k.npz \
  --test_rounds 256 --out ANF_EVAL_130K_R256.json
sleep 15

echo "=== ANF error structure + CDCL completion at 256 rounds ($(date -u)) ==="
timeout 3600 python anf_error_structure.py \
  --ckpt pretrained/anf_sat_sha1_r17_130k.npz --test_rounds 256 \
  --out ANF_ERROR_STRUCTURE_R256.json
echo "=== r5c queue done ($(date -u)) ==="
