#!/bin/bash
# Round-5n queue — chained on run_r5j_queue.sh's marker (inserted before
# r5k, whose waiter was re-pointed at this queue's marker). Dose-response
# point for the ANF free-input upweight: W=32 at 20k steps moved nothing
# (ANF_ANCHOR_R64_UPW32.json, free-input acc 76.6% vs 76.4% baseline;
# inputs were still only ~11% of CE mass). W=256 at lr 5e-4 puts them at
# ~50% of the mass — if free-input accuracy still doesn't move, the
# plateau is the task, not the dose. Also the first production run of
# --mega_steps (8 steps/dispatch; bit-exact per tests/test_mega_step.py)
# — compare steps/s vs the upw32 run's 9.0.
#
#   nohup bash run_r5n_queue.sh > logs/r5n_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5j queue done' logs/r5j_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5j queue done' logs/r5j_queue.log 2>/dev/null; then
  echo "ABORT: r5j queue completion marker never appeared"; exit 1
fi

echo "=== ANF fine-tune W=256, lr 5e-4, mega8 ($(date -u)) ==="
STEPS=20000 DEADLINE_S=7200 LR=5e-4 FREE_UPW=256 LABEL=upw256 \
  MEGA_STEPS=8 INIT_NPZ=pretrained/anf_sat_sha1_r17_130k.npz \
  bash run_anf_flagship.sh
sleep 15
CKPT=$(ls -dt runs_anf/anf_sat_r17_upw256_*/ckpt 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  echo "=== input-anchored eval on upw256 ckpt ($(date -u)) ==="
  timeout 3600 python anf_error_structure.py --ckpt "$CKPT" \
    --test_rounds 64 --skip_frac_ladder --input_anchor \
    --out ANF_ANCHOR_R64_UPW256.json
  timeout 900 env JAX_PLATFORM_NAME=cpu python export_pretrained.py \
    --ckpt "$CKPT" --model anf_sat \
    --out pretrained/anf_sat_sha1_r17_upw256.npz \
    --note "130k flagship + 20k W=256 free-input-upweight fine-tune (lr 5e-4)"
else
  echo "WARNING: no upw256 checkpoint found"
fi
echo "=== r5n queue done ($(date -u)) ==="
