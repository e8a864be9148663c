#!/bin/bash
# Round-6b queue — chained on run_r6a_queue.sh's marker. Executes the
# never-run r5o plan: extend the input-anchored release ladder on the
# baseline 130k ANF checkpoint to 12/16 released bits (0/2/4/8 read
# 46/49/52/61% systems solved, ANF_ANCHOR_R64.json; release-all = 100%)
# to chart the full neural-prior vs CDCL-search tradeoff. Needs the ANF
# cache (rebuilt here first if the machine reset wiped it — jax-free).
#
#   nohup bash run_r6b_queue.sh > logs/r6b_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 5760); do
  grep -q 'r6a queue done' logs/r6a_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r6a queue done' logs/r6a_queue.log 2>/dev/null; then
  echo "ABORT: r6a queue completion marker never appeared"; exit 1
fi
echo "=== rebuilding ANF cache if missing ($(date -u)) ==="
timeout 1800 python build_anf_cache.py || { echo "ANF cache build FAILED"; exit 1; }
sleep 15
echo "=== anchored ladder to 16 released bits ($(date -u)) ==="
timeout 5400 python anf_error_structure.py \
  --ckpt pretrained/anf_sat_sha1_r17_130k.npz --test_rounds 64 \
  --skip_frac_ladder --input_anchor --anchor_release 0,2,4,8,12,16 \
  --out ANF_ANCHOR_R64_LADDER16.json
echo "=== r6b queue done ($(date -u)) ==="
