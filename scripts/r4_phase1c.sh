#!/bin/bash
# Round-4 phase 1c: after the mesh probe outcome (shirt eval deferred until
# the mesh spring solve is gather-only — 250 ms/env-step measured 2026-08-19
# makes a batch-16 shirt eval both fault-prone and ~8 h long), go straight
# to the training critical path: regenerate the gitignored train set, then
# launch the long collection/training run.
#
# Launch detached:  setsid bash scripts/r4_phase1c.sh > /tmp/r4_phase1c.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

handoff() {
  sleep 150
  bash scripts/probe_tpu.sh 4 600 || exit 1
  sleep 150
}

handoff

echo "=== regenerating train set ($(date))"
bash scripts/retry.sh 3 300 python scripts/generate_sets_r3.py \
  --sets train --batch 128 --chunk_steps 96
handoff

echo "=== launching training ($(date))"
mkdir -p runs/round4
[ -f runs/round4/latest_ckpt.pth ] || cp runs/round3/latest_ckpt.pth runs/round4/
setsid bash scripts/train_r3.sh runs/round4 256 128 \
  > /tmp/r4_train.log 2>&1 &
# pgid self-recorded by train_r3.sh (do NOT write $! here: setsid child pgid != $!)
echo "=== training launched pgid $(cat /tmp/r4_train_pgid) ($(date))"
