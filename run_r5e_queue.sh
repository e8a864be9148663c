#!/bin/bash
# Round-5e queue — dtype A/B under the median-of-5 window protocol
# (VERDICT r3 item 9: "re-confirm the bf16-at-fine-blocks parity claim").
# bf16 reading = BENCH_SELF_r05.json from run_r5c; this adds the f32 arm
# on the same machine/day. Chained on run_r5d's completion marker.
#
#   nohup bash run_r5e_queue.sh > logs/r5e_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 1440); do
  grep -q 'r5d queue done' logs/r5d_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5d queue done' logs/r5d_queue.log 2>/dev/null; then
  echo "ABORT: r5d queue completion marker never appeared"; exit 1
fi

echo "=== bench 20k, f32 (DSAT_BLOCK_BF16=0), median-of-5 ($(date -u)) ==="
timeout 2700 env DSAT_BLOCK_BF16=0 python bench.py | tee BENCH_F32_r05.json
echo "=== r5e queue done ($(date -u)) ==="
