#!/bin/bash
# Round-3 TPU pipeline: finish the shirt eval set, then run the big
# training job.  One TPU client at a time (CLAUDE.md), so the phases are
# strictly sequential with a cooldown between them.
#
# Launch detached:  setsid bash scripts/r3_pipeline.sh > /tmp/r3_pipeline.log 2>&1 &
# Stop everything:  kill -- -$(cat /tmp/r3_pipe.pgid)
set -u
cd /root/repo
echo $$ > /tmp/r3_pipe.pgid
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

echo "=== phase 1: shirt eval set top-up ($(date))"
bash scripts/retry.sh 5 150 python scripts/generate_sets_r3.py --sets shirt
echo "=== phase 1 done ($(date)); cooldown 120s"
sleep 120

echo "=== phase 2: training ($(date))"
bash scripts/train_r3.sh runs/round3 128 48
