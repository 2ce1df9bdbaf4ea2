#!/bin/bash
# Evaluate a policy (and the heuristic baseline) on every round-3 eval set.
# Usage: scripts/eval_all_r3.sh [ckpt_path] > eval_results.log
set -u
CKPT=${1:-}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# action space = training config (12 rotations x 8 scales, the
# reference's 96-transform grid)
COMMON="--steps 3 --backend pallas --spring_mode chebyshev --iterations 16 \
  --contact_mode sort --contact_iterations 4 --contact_window 12 \
  --contact_every 2 --exec_mode chunked --chunk_steps 192 \
  --num_rotations 12 \
  --scale_factors 1.0 1.25 1.5 1.75 2.0 2.25 2.5 2.75"
for SET in data_r3/rect_eval_hard_100.hdf5 data_r3/rect_eval_easy_64.hdf5 \
           data_r3/rect_eval_large_64.hdf5 data_r3/shirt_eval_16.hdf5; do
  [ -f "$SET" ] || { echo "skip missing $SET"; continue; }
  N=16
  case "$SET" in *large*) GRID="--max_grid_dim 128";; *) GRID="";; esac
  echo "=== heuristic on $SET"
  bash scripts/retry.sh 3 150 python eval_quality.py --tasks "$SET" \
    --policy heuristic --num_envs $N $GRID $COMMON
  sleep 150  # single-client handoff gap (STATUS.md round-3 lesson)
  if [ -n "$CKPT" ]; then
    echo "=== ckpt $CKPT on $SET"
    bash scripts/retry.sh 3 150 python eval_quality.py --tasks "$SET" \
      --policy ckpt --load "$CKPT" --num_envs $N $GRID $COMMON
    sleep 150  # handoff gap
  fi
done
