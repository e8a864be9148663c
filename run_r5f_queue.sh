#!/bin/bash
# Round-5f queue — re-take the 20k bf16 headline bench under the
# median-of-5 protocol (the r5c attempt deadlocked on device acquisition:
# a forced-CPU pytest run was initializing jax during the bench's startup
# window — the exact CLAUDE.md contention pattern). Chained on r5e.
#
#   nohup bash run_r5f_queue.sh > logs/r5f_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 1920); do
  grep -q 'r5e queue done' logs/r5e_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5e queue done' logs/r5e_queue.log 2>/dev/null; then
  echo "ABORT: r5e queue completion marker never appeared"; exit 1
fi

echo "=== bench 20k bf16, median-of-5, retake ($(date -u)) ==="
timeout 2700 python bench.py | tee BENCH_SELF_r05.json
echo "=== r5f queue done ($(date -u)) ==="
