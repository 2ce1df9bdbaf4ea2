#!/bin/bash
# Round-5b TPU window 2: regenerate the training task set under the
# PRODUCTION physics (calibrated dynamic_friction=0.1 is now the
# SolverParams default), then train until the deadline at 128 envs.
#
# Usage: bash scripts/r5b_window2.sh [END_EPOCH] [num_envs] [chunk] [extra...]
set -u
END=${1:-$(( $(date +%s) + 23400 ))}   # default: 6.5 h
ENVS=${2:-128}
CHUNK=${3:-192}
shift $(( $# > 3 ? 3 : $# ))
EXTRA="$*"
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p runs/round5b

sleep "${W2_PRESLEEP:-150}"  # single-client handoff from the previous job
echo "[w2] regen train512 ($(date -u)) — generation at the FleX scene
mu=0.75 (crumple-grade parity: parity_suite measured drop-crumple ratio
0.43 at mu=.75 vs 0.76 near-flat at the calibrated episode mu=.1;
episodes themselves run the production default)"
timeout 3600 python scripts/generate_sets_r3.py \
  --sets train512 --batch 128 --chunk_steps 96 --gen_fric 0.75 \
  2>&1 | tee runs/round5b/regen_w2.log
echo "[w2] regen rc=$? ($(date -u)); handoff sleep 150"
sleep 150

echo "[w2] training to deadline $(date -u -d @"$END" 2>/dev/null || echo "$END")"
rm -f /tmp/r5b_train_pgid
setsid bash -c '
  echo $$ > /tmp/r5b_train_pgid
  exec bash scripts/retry.sh 100 150 \
    python run_sim.py \
      --tasks data_r3/rect_train_512.hdf5 \
      --log runs/round5b/train \
      --num_envs '"$ENVS"' \
      --exec_mode chunked \
      --chunk_steps '"$CHUNK"' \
      --obs_chunk 64 \
      --render_dim 256 \
      --batch_size 128 \
      --batches_per_update 2 \
      --warmup 128 \
      --save_ckpt 8 \
      --dihedral_augment \
      --seed 51 '"$EXTRA"'
' &
for _ in $(seq 20); do [ -s /tmp/r5b_train_pgid ] && break; sleep 1; done
[ -s /tmp/r5b_train_pgid ] || { echo "[w2] train launch failed"; exit 1; }
PGID=$(cat /tmp/r5b_train_pgid)
kill -0 -- -"$PGID" 2>/dev/null || { echo "[w2] pgid $PGID not alive"; exit 1; }
echo "[w2] trainer pgid $PGID"

alive() { kill -0 -- -"$PGID" 2>/dev/null; }
while [ "$(date +%s)" -lt "$END" ]; do
  alive || { echo "[w2] trainer exited early ($(date -u))"; exit 0; }
  sleep 20
done
echo "[w2] deadline — killing pgid $PGID ($(date -u))"
kill -- -"$PGID" 2>/dev/null
sleep 5
if alive; then kill -9 -- -"$PGID" 2>/dev/null; sleep 3; fi
# GNU timeout children sit in their own process group (CLAUDE.md): pid-scan
ps -eo pid,pgid,args | awk -v pg="$PGID" '$2 == pg {print $1}' | while read -r pid; do
  kill -9 "$pid" 2>/dev/null
done
echo "[w2] done ($(date -u))"
