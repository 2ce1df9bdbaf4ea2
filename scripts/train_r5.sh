#!/bin/bash
# Deadline-bounded collection+training under the fling-knob sweep winner.
#
# Reads runs/round5/knob_winner.txt (written by r5_window2.sh when a
# non-base config wins) and translates it to run_sim flags via
# scripts/winner_flags.py.  128 envs by default: the 256-env trainer ran
# its programs 3.4x slower per env-step than the 128-env eval path
# (STATUS.md round-4 buckets) and the cause is still unattributed —
# prefer the measured-good width until the first profiled round says
# otherwise.
#
# Usage: bash scripts/train_r5.sh [log_dir] [END_EPOCH] [num_envs] [chunk]
set -u
LOG=${1:-runs/round5}
END=${2:-$(( $(date +%s) + 3600 ))}
ENVS=${3:-128}
CHUNK=${4:-192}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
WINNER=base
[ -f runs/round5/knob_winner.txt ] && WINNER=$(cat runs/round5/knob_winner.txt)
WFLAGS=$(python scripts/winner_flags.py "$WINNER")
echo "[train_r5] physics config '$WINNER' -> $WFLAGS"
export R5_LOG="$LOG" R5_ENVS="$ENVS" R5_CHUNK="$CHUNK" R5_WFLAGS="$WFLAGS"
rm -f /tmp/r5_inner_pgid

setsid bash -c '
  echo $$ > /tmp/r5_inner_pgid
  exec bash scripts/retry.sh 100 150 \
    python run_sim.py \
      --tasks data_r3/rect_train_2048.hdf5 \
      --log "$R5_LOG" \
      --num_envs "$R5_ENVS" \
      --exec_mode chunked \
      --chunk_steps "$R5_CHUNK" \
      --obs_chunk 64 \
      --render_dim 256 \
      --batch_size 128 \
      --batches_per_update 2 \
      --warmup 128 \
      --save_ckpt 8 \
      --dihedral_augment \
      --seed 51 \
      $R5_WFLAGS
' &
sleep 3
PGID=$(cat /tmp/r5_inner_pgid)
echo "$PGID" > /tmp/r5_train_pgid
echo "[train_r5] inner pgid $PGID, deadline $(date -u -d @"$END" 2>/dev/null || echo "$END")"

alive() { kill -0 -- -"$PGID" 2>/dev/null; }
while [ "$(date +%s)" -lt "$END" ]; do
  alive || { echo "[train_r5] trainer exited early ($(date -u))"; exit 0; }
  sleep 20
done
echo "[train_r5] deadline — killing pgid $PGID ($(date -u))"
kill -- -"$PGID" 2>/dev/null
sleep 5
# GNU timeout children sit in their own process group (CLAUDE.md): verify
# by name-free pid scan of the recorded group, then of run_sim survivors
if alive; then kill -9 -- -"$PGID" 2>/dev/null; sleep 3; fi
ps -eo pid,pgid,args | awk -v pg="$PGID" '$2 == pg {print $1}' | while read -r pid; do
  kill -9 "$pid" 2>/dev/null
done
echo "[train_r5] done ($(date -u))"
