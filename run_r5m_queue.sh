#!/bin/bash
# Round-5m queue — chained on run_r5l_queue.sh's marker. Dispatch-cost
# ladder on the 20k bf16 workload, quiet host:
#   1. new default basis (device-cached batches)
#   2. old basis (upload-per-step) for continuity with BENCH_SELF_r05
#   3. mega-step probes (8 and 32 steps per dispatch)
# Readings land in BENCH_DISPATCH_LADDER_r05.jsonl (one JSON line each).
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
echo "=== bf16 device-cached (new default) ($(date -u)) ==="
timeout 2700 python bench.py | tee -a "$out"
sleep 15
echo "=== bf16 upload-per-step (old basis) ($(date -u)) ==="
timeout 2700 env DSAT_BENCH_DEVICE_CACHE=0 python bench.py | tee -a "$out"
sleep 15
echo "=== bf16 mega8 ($(date -u)) ==="
timeout 2700 env DSAT_MEGA_STEPS=8 python bench.py | tee -a "$out"
sleep 15
echo "=== bf16 mega32 ($(date -u)) ==="
timeout 2700 env DSAT_MEGA_STEPS=32 python bench.py | tee -a "$out"
echo "=== r5m queue done ($(date -u)) ==="
