#!/bin/bash
# Round-3 tail TPU queue — chains after run_r3_queue.sh (never edit a
# running script; this waits on its PID):
# 1. bench: fine-block quantization (DSAT_FINE_BLOCKS=1) vs the default
#    coarse table — decides whether fine becomes the default
#    (measured fill on the flagship cache: 75.7% -> 86.5% incidence).
# 2. ANF 130k completion (CLAUDE.md priority 4): warm-start the
#    committed step-116k npz, run the remaining ~14k steps at the
#    cosine-tail lr, full-testset eval, export.
# 3. TPE hyperopt study on hardware (priority 3, never ran in round 2).
#
#   nohup bash run_r3_tail.sh <r3_queue_pid> > logs/r3_tail.log 2>&1 &
set -u
PREV_PID=${1:?usage: run_r3_tail.sh <r3_queue_pid>}
CPU_ENV="env DSAT_FORCE_CPU=1"

echo "waiting on r3 queue pid $PREV_PID ($(date -u))"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
sleep 15

echo "=== bench, fine blocks ($(date -u)) ==="
timeout 2400 env DSAT_FINE_BLOCKS=1 python bench.py | tee BENCH_FINE_r03.json
sleep 15
echo "=== bench, default blocks ($(date -u)) ==="
timeout 2400 python bench.py | tee BENCH_SELF_r03.json
sleep 15

echo "=== ANF 130k completion ($(date -u)) ==="
STEPS=14000 LR=5e-4 LABEL=finish130k INIT_NPZ=pretrained/anf_sat_sha1_r17.npz \
  DEADLINE_S=3000 STALE_S=600 bash run_anf_flagship.sh
sleep 15
ANF_CKPT=$(ls -dt runs_anf/anf_sat_r17_finish130k_*/ckpt 2>/dev/null | head -1)
if [ -n "$ANF_CKPT" ]; then
  echo "=== ANF full-testset eval ($(date -u)) ==="
  timeout 2400 python anf_eval.py --ckpt "$ANF_CKPT" --out ANF_EVAL_130K.json
  echo "=== export finished ANF pretrained ==="
  timeout 900 $CPU_ENV python export_pretrained.py --ckpt "$ANF_CKPT" \
    --model anf_sat --out pretrained/anf_sat_sha1_r17_130k.npz
fi
sleep 15

echo "=== TPE hyperopt study on hardware ($(date -u)) ==="
timeout 5400 python hyperopt.py --trials 12 --steps_per_trial 1500 \
  --out HYPEROPT_TPU.jsonl

echo "=== r3 tail complete ($(date -u)) ==="
