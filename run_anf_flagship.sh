#!/bin/bash
# ANF flagship run at reference difficulty (17 SHA-1 rounds, 2-20 free
# bits, reference data/sha_anf.py:24-27): 160k cosine-decay steps on 8000
# instances, with restart-on-failure (resume from the newest checkpoint,
# max 20 restarts), a hang watchdog (the axon tunnel's device acquisition
# can deadlock silently if another client touches the TPU during startup
# — kill and retry if the JSONL log goes stale), and a hard wall-clock
# deadline so the TPU is always released before the round's final bench.
#
#   DEADLINE_S=21600 nohup bash run_anf_flagship.sh > runs_anf/flagship.log 2>&1 &
set -u
STEPS=${STEPS:-160000}
DEADLINE_S=${DEADLINE_S:-21600}
STARTUP_GRACE_S=${STARTUP_GRACE_S:-1500}   # device-cache upload + first compile
STALE_S=${STALE_S:-900}                    # no log progress => hung
CKPT=${CKPT:-}
START=$(date +%s)
for i in $(seq 1 20); do
  left=$((DEADLINE_S - ($(date +%s) - START)))
  if [ "$left" -le 120 ]; then
    echo "=== deadline reached; stopping ($(date -u)) ==="
    break
  fi
  echo "=== anf flagship attempt $i, ${left}s left ($(date -u)) ==="
  args=(--rounds 17 --train_size 8000 --test_size 256
        --train_steps "$STEPS" --eval_every 2000
        --lr "${LR:-1e-3}"
        --free_input_upweight "${FREE_UPW:-1.0}"
        --mega_steps "${MEGA_STEPS:-0}"
        --cosine --label "${LABEL:-flagship160k}" --train_dir runs_anf)
  if [ -n "$CKPT" ]; then args+=(--restore "$CKPT"); fi
  if [ -n "${INIT_NPZ:-}" ]; then args+=(--init_npz "$INIT_NPZ"); fi
  attempt_start=$(date +%s)
  setsid timeout -k 60 "$left" python anf_training.py "${args[@]}" &
  pid=$!
  code=""
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    log=$(ls -t "runs_anf/anf_sat_r17_${LABEL:-flagship160k}_"*/train_log.jsonl 2>/dev/null | head -1)
    # a log older than this attempt belongs to a previous attempt
    if [ -n "$log" ] && [ "$(stat -c %Y "$log")" -ge "$attempt_start" ]; then
      age=$((now - $(stat -c %Y "$log")))
    else
      age=$((now - attempt_start))   # no log yet: count from attempt start
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
    echo "=== anf flagship finished cleanly ($(date -u)) ==="
    break
  fi
  # first attempt creates the run dir; later attempts must resume it
  if [ -z "$CKPT" ]; then
    CKPT=$(ls -dt "runs_anf/anf_sat_r17_${LABEL:-flagship160k}_"*/ckpt 2>/dev/null | head -1)
  fi
  echo "=== exited with $code; restarting from ${CKPT:-scratch} ==="
  sleep 10
done
