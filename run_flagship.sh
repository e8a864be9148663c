#!/bin/bash
# Flagship 167k-step diffusion run (reference schedule, config.py:24) with
# restart-on-failure, a hang watchdog (tunnel device acquisition can
# deadlock silently — kill and retry if the JSONL log goes stale), and a
# hard wall-clock deadline so the TPU is released before the round's
# final bench.
#
#   DEADLINE_S=14400 nohup bash run_flagship.sh > runs_flagship/flagship.log 2>&1 &
#
# Fresh start by default; set CKPT=<dir> to resume an existing run.
set -u
STEPS=${STEPS:-167000}
TRAIN_SIZE=${TRAIN_SIZE:-60000}
DEADLINE_S=${DEADLINE_S:-14400}
STARTUP_GRACE_S=${STARTUP_GRACE_S:-1500}
STALE_S=${STALE_S:-600}
CKPT=${CKPT:-}
LABEL=${LABEL:-flagship167k}
EXTRA_ARGS=${EXTRA_ARGS:-}
START=$(date +%s)
mkdir -p runs_flagship
for i in $(seq 1 20); do
  left=$((DEADLINE_S - ($(date +%s) - START)))
  if [ "$left" -le 120 ]; then
    echo "=== deadline reached; stopping ($(date -u)) ==="
    break
  fi
  echo "=== flagship attempt $i, ${left}s left ($(date -u)) ==="
  args=(--train_steps "$STEPS" --train_size "$TRAIN_SIZE"
        --test_size 2000
        --eval_every 1000 --ckpt_every 1000
        --incidence_precision default
        --label "$LABEL" --train_dir runs_flagship)
  if [ -n "$EXTRA_ARGS" ]; then
    read -ra extra <<< "$EXTRA_ARGS"   # word-split without glob expansion
    args+=("${extra[@]}")
  fi
  if [ -n "$CKPT" ]; then args+=(--restore "$CKPT"); fi
  attempt_start=$(date +%s)
  setsid timeout -k 60 "$left" python diffusion_training.py "${args[@]}" &
  pid=$!
  code=""
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    log=$(ls -t runs_flagship/query_sat_3-sat_${LABEL}_*/train_log.jsonl 2>/dev/null | head -1)
    # a log older than this attempt belongs to a previous attempt
    if [ -n "$log" ] && [ "$(stat -c %Y "$log")" -ge "$attempt_start" ]; then
      age=$((now - $(stat -c %Y "$log")))
    else
      age=$((now - attempt_start))
      [ "$age" -lt "$STARTUP_GRACE_S" ] && age=0
    fi
    if [ "$age" -gt "$STALE_S" ]; then
      echo "=== watchdog: no progress for ${age}s; killing $pid ($(date -u)) ==="
      kill -- -"$pid" 2>/dev/null; sleep 10; kill -9 -- -"$pid" 2>/dev/null
      code=124
      break
    fi
  done
  if [ -z "$code" ]; then
    wait "$pid"; code=$?
  fi
  if [ "$code" -eq 0 ]; then
    echo "=== flagship finished cleanly ($(date -u)) ==="
    break
  fi
  # resume from the newest run dir that actually has a saved step —
  # NOT the original $CKPT: when this invocation itself started from a
  # resume dir, re-restoring it would discard every step since.
  latest=""
  for d in $(ls -dt runs_flagship/query_sat_3-sat_${LABEL}_*/ckpt 2>/dev/null); do
    if ls "$d" 2>/dev/null | grep -qE '^[0-9]+$'; then latest="$d"; break; fi
  done
  [ -n "$latest" ] && CKPT="$latest"
  echo "=== exited with $code; restarting from ${CKPT:-scratch} ==="
  sleep 10
done
