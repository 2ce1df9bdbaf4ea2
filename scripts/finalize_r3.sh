#!/bin/bash
# DEPRECATED (round-3 postmortem): the handoff gaps here are measured
# from the kill signal and lack relay/worker probes — use finalize_r3b.sh
# instead (STATUS.md "TPU single-client handoff discipline").
# Round-3 finalization: stop the training run at STOP_AT, then run the
# capability evals (learning curve on the hard set, heuristic + best ckpt
# on every eval set) and the headline bench, unattended.
#
# Usage:  STOP_AT="18:40" setsid bash scripts/finalize_r3.sh \
#           > /tmp/finalize_r3.log 2>&1 &
# The training run's process GROUP id must be in /tmp/train_r3b.pid
# (written by the launcher); we kill the group by pgid — never by pattern.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
STOP_AT=${STOP_AT:-18:40}

echo "=== waiting until $STOP_AT to stop training ($(date))"
while [ "$(date +%H:%M)" \< "$STOP_AT" ]; do sleep 20; done

if [ -f /tmp/train_r3b.pid ]; then
  PGID=$(cat /tmp/train_r3b.pid)
  echo "=== stopping training pgid $PGID ($(date))"
  kill -- -"$PGID" 2>/dev/null || echo "(already gone)"
fi
sleep 150  # TPU grant release cooldown

echo "=== learning curve on hard-100 ($(date))"
bash scripts/learning_curve_r3.sh runs/round3 32 2>&1 | grep -v WARNING

sleep 60
echo "=== eval_all with latest ckpt ($(date))"
bash scripts/eval_all_r3.sh runs/round3/latest_ckpt.pth 2>&1 | grep -v WARNING

sleep 60
echo "=== bench ($(date))"
bash scripts/retry.sh 3 150 python bench.py

echo "=== finalize done ($(date))"
