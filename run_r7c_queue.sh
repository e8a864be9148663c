#!/bin/bash
# Round-7c queue — chained on run_r7b_queue.sh's marker: ANF tiled
# train-step bench + MH+XOR panels for the remaining checkpoints +
# rw1 tries=4 solve eval.
#
#   nohup bash run_r7c_queue.sh > logs/r7c_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2160); do
  grep -q 'r7b queue done' logs/r7b_queue.log 2>/dev/null && break
  sleep 20
done
if ! grep -q 'r7b queue done' logs/r7b_queue.log 2>/dev/null; then
  echo "ABORT: r7b queue completion marker never appeared"; exit 1
fi
echo "=== r7c start ($(date -u)) ==="

FAILS=0
step() {
  "$@"
  local rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "=== STEP FAILED rc=$rc: $* ($(date -u)) ==="
    FAILS=$((FAILS + 1))
  fi
}

echo "=== ANF tiled bench ($(date -u)) ==="
step timeout 3600 python benchmarks/bench_anf_tiled.py \
  --out BENCH_ANF_TILED.json
sleep 10

RW1=pretrained/query_sat_3sat_diffusion_mlk64_iso45_rw1.npz
if [ -f "$RW1" ]; then
  echo "=== rw1 tries=4 solve eval ($(date -u)) ==="
  step timeout 1800 python solve_eval.py --model_ckpt "$RW1" \
    --label_samples 64 --tries 4 --out SOLVE_EVAL_RW1_T4.json
  sleep 10
fi

if [ "$FAILS" -eq 0 ]; then
  echo "=== r7c queue done ($(date -u)) ==="
else
  echo "=== r7c queue done WITH $FAILS FAILED STEPS ($(date -u)) ==="
fi
