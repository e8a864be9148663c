#!/bin/bash
# Round-5l queue — chained on run_r5p_queue.sh's marker. Clean 20k-budget
# retakes on a quiet host (the r5e f32 reading was contaminated by
# concurrent host load, PERF.md): f32 vs bf16 at the r1-r4 continuity
# budget, both on the new device-cached basis.
#
#   nohup bash run_r5l_queue.sh > logs/r5l_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5p queue done' logs/r5p_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5p queue done' logs/r5p_queue.log 2>/dev/null; then
  echo "ABORT: r5p queue completion marker never appeared"; exit 1
fi
echo "=== bench 20k f32 retake, quiet host ($(date -u)) ==="
timeout 2700 env DSAT_BENCH_NODES=20000 DSAT_BLOCK_BF16=0 python bench.py \
  | tee BENCH_F32_r05b.json
sleep 15
echo "=== bench 20k bf16 device-cached ($(date -u)) ==="
timeout 2700 env DSAT_BENCH_NODES=20000 python bench.py \
  | tee BENCH_20K_DEVCACHE_r05.json
echo "=== r5l queue done ($(date -u)) ==="
