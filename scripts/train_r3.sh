#!/bin/bash
# Round-3 training run: chunked execution at large env batch on the
# regenerated train set.  Resumable (auto-resume from latest_ckpt.pth +
# append-only replay buffer), so retry.sh just re-launches after a TPU
# worker fault.
#
# Usage: scripts/train_r3.sh [log_dir] [num_envs] [chunk_steps]
set -u
LOG=${1:-runs/round3}
ENVS=${2:-128}
CHUNK=${3:-192}
cd /root/repo
# record our process-group id so finalize/window scripts can stop the whole
# run (launch with `setsid bash scripts/train_r3.sh ...` so $$ IS the pgid).
# NOTE: launchers must NOT write these files from `$!` of `setsid ... &` —
# that is the setsid wrapper's pid, NOT the forked child's pgid (round-4
# lastwindow kill missed the trainer because of exactly that; self-recording
# here overwrites any wrong launcher value since the child runs after).
echo $$ > /tmp/train_r3b.pid
echo $$ > /tmp/r4_train_pgid
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
exec bash scripts/retry.sh 100 150 \
  python run_sim.py \
    --tasks data_r3/rect_train_2048.hdf5 \
    --log "$LOG" \
    --num_envs "$ENVS" \
    --exec_mode chunked \
    --chunk_steps "$CHUNK" \
    --backend pallas \
    --spring_mode chebyshev \
    --iterations 16 \
    --contact_iterations 4 \
    --contact_window 12 \
    --contact_every 2 \
    --render_dim 256 \
    --batch_size 128 \
    --batches_per_update 2 \
    --warmup 128 \
    --save_ckpt 8 \
    --dihedral_augment \
    --seed 42
