#!/bin/bash
# Round-5d queue — chained on run_r5c_queue.sh's completion marker.
# Input-anchored ANF completion (fix only the model's predicted free
# message bits — the circuit's <=20 true degrees of freedom — release
# every derived var, CDCL-propagate; ladder by releasing least-confident
# inputs) at 64 and 256 test rounds on the r17 flagship checkpoint.
#
#   nohup bash run_r5d_queue.sh > logs/r5d_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 960); do
  grep -q 'r5c queue done' logs/r5c_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5c queue done' logs/r5c_queue.log 2>/dev/null; then
  echo "ABORT: r5c queue completion marker never appeared"; exit 1
fi

echo "=== ANF input-anchored completion, 64 rounds ($(date -u)) ==="
timeout 3600 python anf_error_structure.py \
  --ckpt pretrained/anf_sat_sha1_r17_130k.npz --test_rounds 64 \
  --skip_frac_ladder --input_anchor \
  --out ANF_ANCHOR_R64.json
sleep 15

echo "=== ANF input-anchored completion, 256 rounds ($(date -u)) ==="
timeout 5400 python anf_error_structure.py \
  --ckpt pretrained/anf_sat_sha1_r17_130k.npz --test_rounds 256 \
  --skip_frac_ladder --input_anchor \
  --out ANF_ANCHOR_R256.json
echo "=== r5d queue done ($(date -u)) ==="
