#!/bin/bash
# Round-4 phase 2: after the learning curve (phase 1), regenerate the
# gitignored train set (lost at the round boundary — only committed files
# survive), then launch the long collection+training run seeded from the
# round-3 checkpoint.
#
# Launch detached:  setsid bash scripts/r4_phase2.sh > /tmp/r4_phase2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

# wait for phase 1 (learning curve) to be stopped by the monitor
while [ ! -f /tmp/curve_done ]; do sleep 20; done
echo "=== phase 1 done; cooldown ($(date))"
sleep 150
bash scripts/probe_tpu.sh 4 600 || exit 1
sleep 150

echo "=== regenerating train set ($(date))"
bash scripts/retry.sh 3 150 python scripts/generate_sets_r3.py \
  --sets train --batch 128 --chunk_steps 96
sleep 150
bash scripts/probe_tpu.sh 4 600 || exit 1
sleep 150

echo "=== launching training ($(date))"
mkdir -p runs/round4
[ -f runs/round4/latest_ckpt.pth ] || cp runs/round3/latest_ckpt.pth runs/round4/
# train_r3.sh execs retry.sh around run_sim (auto-resume + append-only
# replay), runs until killed: scripts/r4_finalize.sh stops it cleanly.
setsid bash scripts/train_r3.sh runs/round4 256 128 \
  > /tmp/r4_train.log 2>&1 &
# pgid self-recorded by train_r3.sh (do NOT write $! here: setsid child pgid != $!)
echo "=== training launched pgid $(cat /tmp/r4_train_pgid) ($(date))"
