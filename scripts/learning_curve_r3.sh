#!/bin/bash
# Learning-curve evidence (VERDICT item 3): evaluate a sequence of training
# checkpoints (plus the heuristic baseline) on a fixed subset of the
# regenerated hard eval set, at the training physics config.
#
# Usage: scripts/learning_curve_r3.sh runs/round3 [episodes]
# Output: one JSON line per checkpoint on stdout (pipe to a log).
set -u
RUN=${1:-runs/round3}
EPISODES=${2:-32}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
COMMON="--tasks data_r3/rect_eval_hard_100.hdf5 --steps 3 --num_envs 16 \
  --backend pallas --spring_mode chebyshev --iterations 16 \
  --contact_iterations 4 --contact_window 12 --contact_every 2 \
  --exec_mode chunked --chunk_steps 192 --episodes $EPISODES \
  --num_rotations 12 \
  --scale_factors 1.0 1.25 1.5 1.75 2.0 2.25 2.5 2.75"
# action space matches the TRAINING config (12 rotations x 8 scales, the
# reference's 96-transform grid) so ckpts aren't evaluated on a coarser
# action space than they trained with

echo "=== heuristic baseline"
bash scripts/retry.sh 3 150 python eval_quality.py --policy heuristic $COMMON
sleep 150  # single-client handoff gap (STATUS.md round-3 lesson)

# at most 6 checkpoints, evenly spaced through training
CKPTS=$(ls "$RUN"/ckpt_*.pth 2>/dev/null | sort)
N=$(echo "$CKPTS" | grep -c . || true)
if [ "$N" -gt 6 ]; then
  CKPTS=$(echo "$CKPTS" | awk -v n="$N" 'BEGIN{k=int((n+5)/6)} NR%k==0 || NR==n' | sort -u)
fi
for CKPT in $CKPTS; do
  echo "=== $CKPT"
  bash scripts/retry.sh 3 150 python eval_quality.py \
    --policy ckpt --load "$CKPT" $COMMON
  sleep 150  # handoff gap
done
