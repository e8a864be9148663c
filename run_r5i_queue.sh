#!/bin/bash
# Round-5i queue — top up the TPE study to the reference's 50 trials
# (reference hyperopt.py:155) if the r5c pass was deadline-cut, using
# hyperopt.py --resume_from (completed trials re-observed by the
# sampler). Chained on r5h's marker.
#
#   nohup bash run_r5i_queue.sh > logs/r5i_queue.log 2>&1 &
set -u
cd /root/repo
for i in $(seq 1 2880); do
  grep -q 'r5h queue done' logs/r5h_queue.log 2>/dev/null && break
  sleep 15
done
if ! grep -q 'r5h queue done' logs/r5h_queue.log 2>/dev/null; then
  echo "ABORT: r5h queue completion marker never appeared"; exit 1
fi

done_trials=$(wc -l < HYPEROPT_TPU_50.jsonl 2>/dev/null || echo 0)
if [ "$done_trials" -ge 50 ]; then
  echo "TPE study already at $done_trials trials; nothing to do"
else
  echo "=== TPE top-up from $done_trials to 50 trials ($(date -u)) ==="
  timeout 7200 python hyperopt.py --trials 50 --steps_per_trial 500 \
    --resume_from HYPEROPT_TPU_50.jsonl --out HYPEROPT_TPU_50.jsonl
fi
echo "=== r5i queue done ($(date -u)) ==="
