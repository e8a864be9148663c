#!/bin/bash
# Round-5l queue — chained on run_r5k_queue.sh's marker. Clean f32
# median-of-5 retake of the 20k bench: the r5e reading (BENCH_F32_r05)
# was contaminated by concurrent host-CPU load (PERF.md round-5 note).
# Quiet-host discipline: nothing else may run during this.
#
#   nohup bash run_r5l_queue.sh > logs/r5l_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5k queue done' logs/r5k_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5k queue done' logs/r5k_queue.log 2>/dev/null; then
  echo "ABORT: r5k queue completion marker never appeared"; exit 1
fi
echo "=== bench 20k f32 retake, quiet host ($(date -u)) ==="
timeout 2700 env DSAT_BLOCK_BF16=0 python bench.py | tee BENCH_F32_r05b.json
echo "=== r5l queue done ($(date -u)) ==="
