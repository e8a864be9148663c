#!/bin/bash
# Round-3f TPU queue — chained after run_r3e_queue.sh:
# 0. Clean steady-state headline benches (both dtype variants now have
#    persistent-cached executables + the 2-warm fix in bench.py): decides
#    whether block-bf16 stays default on the sorted-batch stream (the
#    mixed-batch ablation said 2.34x; BENCH_BF16_r03's 45.75 ms was a
#    1-warm fresh-executable reading while f32 re-read 29.44 ms warm).
# 1. Temperature sweep on the finished ML167k checkpoint (pure eval):
#    the reverse kernel factorizes per variable per step, so its per-step
#    commitment strength is a calibration knob (sampler.py temperature);
#    diffusion_sample adds the Bernoulli terminal draw. Readout: raw
#    (no-refiner) entropy gap / chi2 p vs the recorded nofreeze t=1.0
#    (UNIFORMITY_SUMMARY_ML167K.json: gap 0.1006, p ~ 0).
# 2. Bank-size gate: if the k64 pilot (r3e) cut the raw-proposal entropy
#    gap >=20% vs the k16 pilot on matched formulas, run the FULL 167k
#    k64 flagship + the same PRE-REGISTERED battery as r3b (k=40,
#    8 formulas; pass = raw nofreeze median chi2 p within the exact-
#    uniform floor's range AND mean entropy gap <= 0.1) + solve evals.
# 3. Otherwise: hypothesis-(c) pilot — 8k steps, k16 banks, noise_skew=2
#    (training noise drawn ~ 2t: double weight at high noise where mode
#    selection happens), f32 to match the k16 pilot — then the same
#    nofreeze battery.
#
#   nohup bash run_r3f_queue.sh <r3e_pid> > logs/r3f_queue.log 2>&1 &
set -u
cd /root/repo
PREV_PID=${1:?usage: run_r3f_queue.sh <r3e_pid>}

echo "waiting on r3e queue pid $PREV_PID ($(date -u))"
while kill -0 "$PREV_PID" 2>/dev/null; do sleep 30; done
sleep 15

echo "=== headline bench, f32 (DSAT_BLOCK_BF16=0) ($(date -u)) ==="
timeout 2400 env DSAT_BLOCK_BF16=0 python bench.py | tee BENCH_SELF_r03d.json
sleep 15
echo "=== headline bench, block-bf16 default ($(date -u)) ==="
timeout 2400 python bench.py | tee BENCH_BF16_r03b.json
sleep 15

echo "=== temperature sweep on ML167k (pure eval) ($(date -u)) ==="
timeout 7200 python uniformity_benchmark.py \
  --model_ckpt pretrained/query_sat_3sat_diffusion_ml167k.npz \
  --n_formulas 8 --k 10 \
  --variants uniform,diffusion_sample,diffusion_nofreeze_t1.25,diffusion_nofreeze_t1.1,diffusion_nofreeze_t0.8 \
  --out benchmarks_temp_sweep.jsonl \
  --summary_out UNIFORMITY_SUMMARY_TEMP.json
sleep 15

GATE=$(python - <<'EOF'
import json
try:
    base, new = {}, {}
    for fn, d in (("benchmarks_ml8k.jsonl", base),
                  ("benchmarks_ml8k_rest.jsonl", base),
                  ("benchmarks_ml8k_k64.jsonl", new)):
        for line in open(fn):
            r = json.loads(line)
            if "diffusion_nofreeze" in r:
                s = r["diffusion_nofreeze"]
                d[r["formula"]] = s["uniform_entropy"] - s["count_entropy"]
    common = sorted(set(base) & set(new))
    bm = sum(base[k] for k in common) / len(common)
    nm = sum(new[k] for k in common) / len(common)
    print(f"gate: k16 gap {bm:.4f} vs k64 gap {nm:.4f} on {len(common)} matched formulas")
    print("GO" if nm <= 0.8 * bm else "STOP")
except Exception as e:
    print(f"gate error: {e}")
    print("STOP")
EOF
)
echo "$GATE"

if echo "$GATE" | grep -q '^GO$'; then
  echo "=== k64 flagship GO: full 167k schedule, fresh (fine blocks + block-bf16 defaults) ($(date -u)) ==="
  STEPS=167000 LABEL=mlk64 DEADLINE_S=10800 STALE_S=900 \
    EXTRA_ARGS="--label_samples 64" bash run_flagship.sh
  sleep 15

  K64_RUN=""
  for d in $(ls -dt runs_flagship/query_sat_3-sat_mlk64_* 2>/dev/null); do
    if ls "$d/ckpt" 2>/dev/null | grep -qE '^[0-9]+$'; then K64_RUN="$d"; break; fi
  done
  if [ -n "$K64_RUN" ]; then
    echo "=== export k64 pretrained npz ($(date -u)) ==="
    timeout 900 env DSAT_FORCE_CPU=1 python export_pretrained.py \
      --ckpt "$K64_RUN/ckpt" --model query_sat \
      --out pretrained/query_sat_3sat_diffusion_mlk64.npz
    echo "=== DECISIVE pre-registered battery (k=40) on k64 flagship ($(date -u)) ==="
    timeout 10800 python uniformity_benchmark.py --model_ckpt "$K64_RUN/ckpt" \
      --n_formulas 8 --k 40 \
      --variants uniform,diffusion_nofreeze,diffusion_mh_xor \
      --out benchmarks_mlk64_167k.jsonl \
      --summary_out UNIFORMITY_SUMMARY_MLK64_167K.json
    sleep 15
    echo "=== solve eval, k64 flagship tries=1 ($(date -u)) ==="
    timeout 2400 python solve_eval.py --model_ckpt "$K64_RUN/ckpt" \
      --label_samples 64 --out SOLVE_EVAL_MLK64.json
    sleep 15
    echo "=== solve eval, k64 flagship tries=4 ($(date -u)) ==="
    timeout 2400 python solve_eval.py --model_ckpt "$K64_RUN/ckpt" \
      --label_samples 64 --tries 4 --out SOLVE_EVAL_MLK64_T4.json
  fi
else
  echo "=== k64 gate STOP: hypothesis-(c) pilot (noise_skew=2, k16, 8k steps, f32) ($(date -u)) ==="
  timeout 2400 env DSAT_BLOCK_BF16=0 python diffusion_training.py \
    --train_steps 8000 --label_samples 16 --noise_skew 2.0 \
    --label ml8k_skew2 --train_dir runs_ml \
    --eval_every 4000 --ckpt_every 4000
  sleep 15
  SKEW_CKPT=$(ls -dt runs_ml/*ml8k_skew2*/ckpt 2>/dev/null | head -1)
  if [ -n "$SKEW_CKPT" ]; then
    echo "=== nofreeze battery: noise_skew=2 checkpoint ($(date -u)) ==="
    timeout 1800 python uniformity_benchmark.py --model_ckpt "$SKEW_CKPT" \
      --n_formulas 8 --k 10 --variants uniform,diffusion_nofreeze \
      --out benchmarks_ml8k_skew2.jsonl \
      --summary_out UNIFORMITY_SUMMARY_ML8K_SKEW2.json
  fi
fi

echo "=== r3f queue complete ($(date -u)) ==="
