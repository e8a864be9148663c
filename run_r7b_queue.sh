#!/bin/bash
# Round-7b queue — chained on run_r7a_queue.sh's marker. ANF input-prior
# program (VERDICT r4 items 5+7) and the round's perf experiments
# (items 4+6).
#
#   1. r17 marginalized eval (16-seed posterior average) + anchored-CDCL
#      ladder on the marginalized posterior + marginals dump
#   2. harder-regime dumps where unconstrained CDCL stops being free:
#      r17 with 24-40 free bits, r20 with 2-20 free bits
#   3. CPU prior studies: plain vs input-seeded CDCL conflict curves
#   4. tiled flat-path bench, row-packing MXU-fill bench, headline bench
#
#   nohup bash run_r7b_queue.sh > logs/r7b_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2160); do
  grep -q 'r7a queue done' logs/r7a_queue.log 2>/dev/null && break
  sleep 20
done
if ! grep -q 'r7a queue done' logs/r7a_queue.log 2>/dev/null; then
  echo "ABORT: r7a queue completion marker never appeared"; exit 1
fi
echo "=== r7b start ($(date -u)) ==="

FAILS=0
step() {
  "$@"
  local rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "=== STEP FAILED rc=$rc: $* ($(date -u)) ==="
    FAILS=$((FAILS + 1))
  fi
}

ANF=pretrained/anf_sat_sha1_r17_130k.npz

echo "=== ANF r17 marginalized eval + dump ($(date -u)) ==="
step timeout 3600 python anf_eval.py --ckpt "$ANF" --test_rounds 64 \
  --marginalize_seeds 16 --cdcl_completion \
  --dump_marginals ANF_MARG_R17_M16.npz --out ANF_EVAL_R64_MARG16.json
sleep 10
echo "=== ANF r17 hard free-bits dump (24-40) ($(date -u)) ==="
step timeout 3600 python anf_eval.py --ckpt "$ANF" --rounds 17 \
  --min_free_bits 24 --max_free_bits 40 --test_size 128 --test_rounds 64 \
  --marginalize_seeds 8 --dump_marginals ANF_MARG_R17_FB2440.npz \
  --out ANF_EVAL_R17_FB2440.json
sleep 10
echo "=== ANF r20 dump ($(date -u)) ==="
step timeout 3600 python anf_eval.py --ckpt "$ANF" --rounds 20 \
  --min_free_bits 2 --max_free_bits 20 --test_size 128 --max_graphs 4 \
  --test_rounds 64 --marginalize_seeds 8 \
  --dump_marginals ANF_MARG_R20.npz --out ANF_EVAL_R20.json
sleep 10

echo "=== CPU prior studies ($(date -u)) ==="
step timeout 7200 env JAX_PLATFORM_NAME=cpu python benchmarks/anf_prior_study.py \
  --marginals ANF_MARG_R17_M16.npz --json ANF_PRIOR_R17.json
step timeout 7200 env JAX_PLATFORM_NAME=cpu python benchmarks/anf_prior_study.py \
  --marginals ANF_MARG_R17_FB2440.npz --json ANF_PRIOR_R17_FB2440.json
step timeout 7200 env JAX_PLATFORM_NAME=cpu python benchmarks/anf_prior_study.py \
  --marginals ANF_MARG_R20.npz --max_graphs 4 --json ANF_PRIOR_R20.json

echo "=== tiled flat bench ($(date -u)) ==="
step timeout 3600 python benchmarks/bench_flat_pallas.py \
  --out BENCH_FLAT_TILED.json
sleep 10
echo "=== row-packing bench ($(date -u)) ==="
step timeout 3600 python benchmarks/bench_rowpack.py --out BENCH_ROWPACK.json
sleep 10
echo "=== headline bench ($(date -u)) ==="
step timeout 2400 python bench.py

if [ "$FAILS" -eq 0 ]; then
  echo "=== r7b queue done ($(date -u)) ==="
else
  echo "=== r7b queue done WITH $FAILS FAILED STEPS ($(date -u)) ==="
fi
