#!/bin/bash
# Round-7e queue — chained on run_r7d_queue.sh's marker. Row-packing
# rerun with enough batches to form k=2/4 groups in every shape class
# (the first run had one k2 group and no k4, BENCH_ROWPACK.json).
#
#   nohup bash run_r7e_queue.sh > logs/r7e_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2160); do
  grep -q 'r7d queue done' logs/r7d_queue.log 2>/dev/null && break
  sleep 20
done
if ! grep -q 'r7d queue done' logs/r7d_queue.log 2>/dev/null; then
  echo "ABORT: r7d queue completion marker never appeared"; exit 1
fi
echo "=== r7e start ($(date -u)) ==="
FAILS=0
step() {
  "$@"
  local rc=$?
  if [ "$rc" -ne 0 ]; then
    echo "=== STEP FAILED rc=$rc: $* ($(date -u)) ==="
    FAILS=$((FAILS + 1))
  fi
}
step timeout 3600 python benchmarks/bench_rowpack.py --n_batches 32 \
  --factors 1,2,4 --out BENCH_ROWPACK_N32.json
if [ "$FAILS" -eq 0 ]; then
  echo "=== r7e queue done ($(date -u)) ==="
else
  echo "=== r7e queue done WITH $FAILS FAILED STEPS ($(date -u)) ==="
fi
