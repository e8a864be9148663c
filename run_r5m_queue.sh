#!/bin/bash
# Round-5m queue (v2) — chained on run_r5l_queue.sh's marker (already
# fired; relaunched after the v1 wrapper was killed mid-start). The r5l
# device-cached retakes rewrote the picture: 20k f32 86.3 / bf16 87.7 M
# edges/s (27 ms steps — dtype a wash, device-caching the real lever),
# so the dispatch ladder now probes mega-steps at BOTH budgets:
# 27 ms steps are where per-dispatch overhead would matter most.
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
echo "=== 20k mega8 ($(date -u)) ==="
timeout 3600 env DSAT_BENCH_NODES=20000 DSAT_MEGA_STEPS=8 python bench.py \
  | tee -a "$out"
sleep 15
echo "=== 20k mega32 ($(date -u)) ==="
timeout 3600 env DSAT_BENCH_NODES=20000 DSAT_MEGA_STEPS=32 python bench.py \
  | tee -a "$out"
sleep 15
echo "=== 60k mega8 ($(date -u)) ==="
timeout 3600 env DSAT_BENCH_NODES=60000 DSAT_MEGA_STEPS=8 python bench.py \
  | tee -a "$out"
echo "=== r5m queue done ($(date -u)) ==="
