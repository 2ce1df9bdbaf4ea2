#!/bin/bash
# DEPRECATED (round-3 postmortem): the handoff gaps here are measured
# from the kill signal and lack relay/worker probes — use round4_first_hour.sh + probe_tpu.sh
# instead (STATUS.md "TPU single-client handoff discipline").
# Round-3 finalization v2: stop training at STOP_AT, run OFFLINE training
# epochs on the final replay buffer (cheap: ~1.8 ms/sample host reads),
# then the capability evals and the headline bench, unattended.
#
# Usage:  STOP_AT="18:30" setsid bash scripts/finalize_r3b.sh \
#           > /tmp/finalize_r3.log 2>&1 &
# NOTE: STOP_AT is a same-day lexicographic HH:MM compare (no midnight
# wrap); the training run's pgid must be in /tmp/train_r3b.pid.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
STOP_AT=${STOP_AT:-18:30}

echo "=== waiting until $STOP_AT to stop training ($(date))"
while [ "$(date +%H:%M)" \< "$STOP_AT" ]; do sleep 20; done

if [ -f /tmp/train_r3b.pid ]; then
  PGID=$(cat /tmp/train_r3b.pid)
  echo "=== stopping training pgid $PGID ($(date))"
  kill -- -"$PGID" 2>/dev/null || echo "(already gone)"
fi
sleep 150  # TPU grant release cooldown

echo "=== offline training on the final buffer ($(date))"
bash scripts/retry.sh 3 150 python scripts/offline_train_r3.py \
  --log runs/round3 --steps 600 --save_every 150 --batch_size 128

sleep 60
echo "=== learning curve on hard-100 ($(date))"
bash scripts/learning_curve_r3.sh runs/round3 32 2>&1 | grep -v WARNING

sleep 60
echo "=== eval_all with final ckpt ($(date))"
bash scripts/eval_all_r3.sh runs/round3/latest_ckpt.pth 2>&1 | grep -v WARNING

sleep 60
echo "=== bench ($(date))"
bash scripts/retry.sh 3 150 python bench.py

echo "=== finalize done ($(date))"
