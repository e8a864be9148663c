#!/bin/bash
# Round-5h queue — 60k re-measure with the graph cap fixed (the first
# 60k reading under-packed: the historical 512-graph cap binds at 60k
# for small-var size-sorted batches, shapes showed G=512 saturated).
# Chained on r5g's marker. New shapes -> fresh compiles on first run.
#
#   nohup bash run_r5h_queue.sh > logs/r5h_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5g queue done' logs/r5g_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5g queue done' logs/r5g_queue.log 2>/dev/null; then
  echo "ABORT: r5g queue completion marker never appeared"; exit 1
fi

echo "=== bench 60k, graph cap scaled (max_graphs=1500) ($(date -u)) ==="
timeout 5400 env DSAT_BENCH_NODES=60000 python bench.py | tee BENCH_60K_FULLPACK.json
if grep -q 'train_edge_throughput' BENCH_60K_FULLPACK.json; then
  cp BENCH_60K_FULLPACK.json BENCH_60K.json
  echo "BENCH_60K.json superseded with full-pack reading"
fi
echo "=== r5h queue done ($(date -u)) ==="
