#!/bin/bash
# Round-6c queue — chained on run_r6b_queue.sh's marker. Solve-curve
# completion for the definitive isolation model: tries=8/16 readings to
# compare against the raw-flagship bests (97.3%/98.1%, commit c2259bc).
#
#   nohup bash run_r6c_queue.sh > logs/r6c_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 5760); do
  grep -q 'r6b queue done' logs/r6b_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r6b queue done' logs/r6b_queue.log 2>/dev/null; then
  echo "ABORT: r6b queue completion marker never appeared"; exit 1
fi
RUN=$(ls -dt runs_flagship/query_sat_3-sat_mlk64iso45full_*/ckpt 2>/dev/null | head -1)
if [ -z "$RUN" ]; then
  # machine resets wipe runs_flagship/; the committed exported npz is the
  # durable fallback (solve_eval accepts npz checkpoints) — ADVICE r4
  RUN=pretrained/query_sat_3sat_diffusion_mlk64_iso45.npz
  [ -f "$RUN" ] || { echo "no iso45full checkpoint or npz; abort"; exit 1; }
  echo "run dir missing; falling back to $RUN"
fi
echo "=== solve eval tries=8 ($(date -u)) ==="
timeout 1800 python solve_eval.py --model_ckpt "$RUN" --label_samples 64 \
  --tries 8 --out SOLVE_EVAL_MLK64ISO45FULL_T8.json
sleep 15
echo "=== solve eval tries=16 ($(date -u)) ==="
timeout 3000 python solve_eval.py --model_ckpt "$RUN" --label_samples 64 \
  --tries 16 --out SOLVE_EVAL_MLK64ISO45FULL_T16.json
echo "=== r6c queue done ($(date -u)) ==="
