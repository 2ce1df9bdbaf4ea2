#!/bin/bash
# Deadline-bounded 256-env collection+training run (round-4b / round-5).
#
# Differences vs train_r3.sh:
#   - 256 envs (the 2026-08-19 OOM was the 96-view obs warp at full env
#     width; obs_chunk=64 caps it — commit 23399cf) with chunk_steps 96
#     (~11 s/device-call at 256 envs, inside the 30 s worker-fault limit).
#   - HARD DEADLINE: arg 2 is an epoch by which the chip must be FREE.
#     The trainer runs in its own session; at the deadline the wrapper
#     kills that process group, verifies with ps, and exits.  run_sim is
#     auto-resumable (latest_ckpt.pth + append-only replay), so deadline
#     kills lose at most one in-flight action batch.
#   - The inner session self-records its pgid via `bash -c 'echo $$ ...'`
#     (the CLAUDE.md stale-pgid lesson: `$!` of `setsid ... &` can be the
#     wrapper pid, not the child's pgid).
#
# Usage: bash scripts/train_r4b.sh [log_dir] [END_EPOCH] [num_envs] [chunk]
set -u
LOG=${1:-runs/round4}
END=${2:-$(( $(date +%s) + 3600 ))}
ENVS=${3:-256}
CHUNK=${4:-96}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
export R4B_LOG="$LOG" R4B_ENVS="$ENVS" R4B_CHUNK="$CHUNK"
rm -f /tmp/r4b_inner_pgid

setsid bash -c '
  echo $$ > /tmp/r4b_inner_pgid
  exec bash scripts/retry.sh 100 150 \
    python run_sim.py \
      --tasks data_r3/rect_train_2048.hdf5 \
      --log "$R4B_LOG" \
      --num_envs "$R4B_ENVS" \
      --exec_mode chunked \
      --chunk_steps "$R4B_CHUNK" \
      --obs_chunk 64 \
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
      --seed 43
' &
sleep 3
PGID=$(cat /tmp/r4b_inner_pgid)
echo "$PGID" > /tmp/r4_train_pgid  # window/finalize scripts look here
echo "[train_r4b] inner pgid $PGID, deadline $(date -u -d @"$END" 2>/dev/null || echo "$END")"

alive() { kill -0 -- -"$PGID" 2>/dev/null; }
while [ "$(date +%s)" -lt "$END" ]; do
  alive || { echo "[train_r4b] trainer exited early ($(date -u))"; exit 0; }
  sleep 20
done
echo "[train_r4b] deadline reached, stopping pgid $PGID ($(date -u))"
kill -- -"$PGID" 2>/dev/null
for i in $(seq 1 15); do alive || break; sleep 2; done
if alive; then
  echo "[train_r4b] SIGKILL fallback"
  kill -9 -- -"$PGID" 2>/dev/null
fi
sleep 3
if ps -e -o pgid,cmd | awk -v p="$PGID" '$1 == p' | grep -q .; then
  echo "[train_r4b] WARNING: group $PGID still alive after kill"
else
  echo "[train_r4b] chip free ($(date -u))"
fi
