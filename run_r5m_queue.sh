#!/bin/bash
# Round-5m queue — chained on run_r5l_queue.sh's marker. Dispatch-cost
# ladder at the NEW default 60k budget, quiet host: mega-step probes
# (8 and 32 steps per dispatch) and the upload-per-step basis, against
# the committed device-cached default (BENCH_60K_FULLPACK.json 74.4 M).
# Generous timeouts: the scan executables are fresh server-side
# compiles for every 60k shape.
#
#   nohup bash run_r5m_queue.sh > logs/r5m_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5l queue done' logs/r5l_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5l queue done' logs/r5l_queue.log 2>/dev/null; then
  echo "ABORT: r5l queue completion marker never appeared"; exit 1
fi
out=BENCH_DISPATCH_LADDER_r05.jsonl
: > "$out"
echo "=== 60k mega8 ($(date -u)) ==="
timeout 3600 env DSAT_MEGA_STEPS=8 python bench.py | tee -a "$out"
sleep 15
echo "=== 60k mega32 ($(date -u)) ==="
timeout 3600 env DSAT_MEGA_STEPS=32 python bench.py | tee -a "$out"
sleep 15
echo "=== 60k upload-per-step (old basis) ($(date -u)) ==="
timeout 2700 env DSAT_BENCH_DEVICE_CACHE=0 python bench.py | tee -a "$out"
echo "=== r5m queue done ($(date -u)) ==="
