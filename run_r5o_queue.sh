#!/bin/bash
# Round-5o queue — chained on run_r5m_queue.sh's marker. Complete the
# input-anchored release ladder on the baseline 130k checkpoint:
# 0/2/4/8 read 46/49/52/61% systems solved (ANF_ANCHOR_R64.json);
# extend to 12/16 released bits to chart the full neural-prior vs
# CDCL-search tradeoff (release-all = 100%).
#
#   nohup bash run_r5o_queue.sh > logs/r5o_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5m queue done' logs/r5m_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5m queue done' logs/r5m_queue.log 2>/dev/null; then
  echo "ABORT: r5m queue completion marker never appeared"; exit 1
fi
echo "=== anchored ladder to 16 released bits ($(date -u)) ==="
timeout 5400 python anf_error_structure.py \
  --ckpt pretrained/anf_sat_sha1_r17_130k.npz --test_rounds 64 \
  --skip_frac_ladder --input_anchor --anchor_release 0,2,4,8,12,16 \
  --out ANF_ANCHOR_R64_LADDER16.json
echo "=== r5o queue done ($(date -u)) ==="
