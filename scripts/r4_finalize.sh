#!/bin/bash
# Round-4 phase 3: stop the training run, big offline pass (dihedral
# augmentation) on the collected buffer, then the full eval table with the
# final checkpoint, then bench.
#
# Launch detached:  setsid bash scripts/r4_finalize.sh > /tmp/r4_finalize.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
OFFLINE_STEPS=${1:-1200}

if [ -f /tmp/r4_train_pgid ]; then
  kill -- -"$(cat /tmp/r4_train_pgid)" 2>/dev/null
  echo "=== training stopped ($(date))"
fi
sleep 150
bash scripts/probe_tpu.sh 4 600 || exit 1
sleep 150

echo "=== offline pass: $OFFLINE_STEPS steps, dihedral ($(date))"
bash scripts/retry.sh 3 150 python scripts/offline_train_r3.py \
  --log runs/round4 --steps "$OFFLINE_STEPS" --batch_size 128 \
  --dihedral_augment --save_every 200
sleep 150
bash scripts/probe_tpu.sh 4 600 || exit 1
sleep 150

echo "=== eval_all with final round-4 ckpt ($(date))"
bash scripts/eval_all_r3.sh runs/round4/latest_ckpt.pth 2>&1 \
  | grep --line-buffered -v WARNING
sleep 150
bash scripts/probe_tpu.sh 4 600 || exit 1
sleep 150

echo "=== bench ($(date))"
bash scripts/retry.sh 3 150 python bench.py
echo "=== round-4 finalize done ($(date))"
