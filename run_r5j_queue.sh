#!/bin/bash
# Round-5j queue — chained on run_r5f_queue.sh's completion marker.
# Replaces the former r5g/r5h/r5i waiters (killed by PID): their work is
# folded in, reordered so (a) the round-5 training lever — free-input
# upweighted ANF fine-tune — gets the prime TPU slot, and (b) the 60k
# convergence check keys off the FULL-PACK 60k bench (the old r5g read
# the stale cap-handicapped BENCH_60K.json before r5h superseded it).
#
#   nohup bash run_r5j_queue.sh > logs/r5j_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 1920); do
  grep -q 'r5f queue done' logs/r5f_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5f queue done' logs/r5f_queue.log 2>/dev/null; then
  echo "ABORT: r5f queue completion marker never appeared"; exit 1
fi

START=$(date +%s)
DEADLINE_TOTAL=${DEADLINE_TOTAL:-30600}   # 8.5h cap for this whole tail
left() { echo $(( DEADLINE_TOTAL - ($(date +%s) - START) )); }

echo "=== [1/6] ANF free-input-upweight fine-tune, W=32 ($(date -u)) ==="
# warm start from the 130k flagship; 20k cosine steps 3e-4 -> 1.5e-4
STEPS=20000 DEADLINE_S=10800 LR=3e-4 FREE_UPW=32 LABEL=upw32 \
  INIT_NPZ=pretrained/anf_sat_sha1_r17_130k.npz \
  bash run_anf_flagship.sh
sleep 15

CKPT=$(ls -dt runs_anf/anf_sat_r17_upw32_*/ckpt 2>/dev/null | head -1)
if [ -n "$CKPT" ]; then
  echo "=== [2/6] input-anchored eval on fine-tuned ckpt ($(date -u)) ==="
  timeout 3600 python anf_error_structure.py --ckpt "$CKPT" \
    --test_rounds 64 --skip_frac_ladder --input_anchor \
    --out ANF_ANCHOR_R64_UPW32.json
  timeout 900 env JAX_PLATFORM_NAME=cpu python export_pretrained.py \
    --ckpt "$CKPT" --model anf_sat \
    --out pretrained/anf_sat_sha1_r17_upw32.npz \
    --note "130k flagship + 20k free-input-upweight (W=32) fine-tune"
else
  echo "WARNING: no upw32 checkpoint found; skipping its eval"
fi
sleep 15

K64_CKPT=runs_flagship/query_sat_3-sat_mlk64_20260819_231652/ckpt
if [ "$(left)" -gt 3600 ]; then
  echo "=== [3/6] solve eval tries=8 ($(date -u), $(left)s left) ==="
  timeout 2700 python solve_eval.py --model_ckpt "$K64_CKPT" \
    --label_samples 64 --tries 8 --out SOLVE_EVAL_MLK64_T8.json
  sleep 15
else
  echo "skipping solve eval tries=8, $(left)s left"
fi
if [ "$(left)" -gt 4500 ]; then
  echo "=== [3/6] solve eval tries=16 ($(date -u), $(left)s left) ==="
  timeout 3600 python solve_eval.py --model_ckpt "$K64_CKPT" \
    --label_samples 64 --tries 16 --out SOLVE_EVAL_MLK64_T16.json
  sleep 15
else
  echo "skipping solve eval tries=16, $(left)s left"
fi

if [ "$(left)" -gt 5400 ]; then
  echo "=== [4/6] bench 60k full-pack ($(date -u), $(left)s left) ==="
  timeout 5400 env DSAT_BENCH_NODES=60000 python bench.py \
    | tee BENCH_60K_FULLPACK.json
  if grep -q 'train_edge_throughput' BENCH_60K_FULLPACK.json; then
    cp BENCH_60K_FULLPACK.json BENCH_60K.json
    echo "BENCH_60K.json superseded with full-pack reading"
  fi
  sleep 15
else
  echo "skipping 60k full-pack bench, $(left)s left"
fi

won=$(python3 - <<'EOF'
import json
try:
    b60 = json.load(open('BENCH_60K_FULLPACK.json'))
    print(1 if b60.get('value', 0) > 68.9 else 0)
except Exception:
    print(0)
EOF
)
if [ "$won" = "1" ] && [ "$(left)" -gt 7200 ]; then
  echo "=== [5/6] 60k won: paired convergence check ($(date -u)) ==="
  timeout 3000 python diffusion_training.py --train_steps 1500 \
    --train_size 60000 --test_size 2000 --eval_every 500 --ckpt_every 1500 \
    --label conv20k --train_dir runs_sanity --max_nodes_per_batch 20000
  sleep 15
  timeout 3000 python diffusion_training.py --train_steps 1500 \
    --train_size 60000 --test_size 2000 --eval_every 500 --ckpt_every 1500 \
    --label conv60k --train_dir runs_sanity --max_nodes_per_batch 60000
  echo "compare runs_sanity/*conv20k*/train_log.jsonl vs *conv60k*"
else
  echo "convergence check skipped (won=$won, $(left)s left)"
fi

done_trials=$(wc -l < HYPEROPT_TPU_50.jsonl 2>/dev/null || echo 0)
if [ "$done_trials" -ge 50 ]; then
  echo "[6/6] TPE study already at $done_trials trials; nothing to do"
elif [ "$(left)" -gt 3600 ]; then
  echo "=== [6/6] TPE top-up from $done_trials to 50 ($(date -u)) ==="
  timeout 7200 python hyperopt.py --trials 50 --steps_per_trial 500 \
    --resume_from HYPEROPT_TPU_50.jsonl --out HYPEROPT_TPU_50.jsonl
fi
echo "=== r5j queue done ($(date -u)) ==="
