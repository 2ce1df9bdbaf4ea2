#!/bin/bash
# Round-4 phase 1 (critical TPU path, in priority order):
#   1. chip probe (wait out a dead relay / wedged worker)
#   2. mesh-solver probe (bisects the round-3 shirt kernel fault:
#      Mosaic bug vs per-call wall time) — VERDICT item 2 prerequisite
#   3. first shirt coverage@3 rows (heuristic + round-3 ckpt), only if
#      the probe completed — a faulting mesh path would wedge the worker
#      and poison the train regen behind it
#   4. regenerate the gitignored train set (lost at the round boundary)
#   5. launch the long round-4 collection/training run (256 envs)
#
# Launch detached:  setsid bash scripts/r4_phase1.sh > /tmp/r4_phase1.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

handoff() {  # quiet gap between jobs, measured from *here* (job exited)
  sleep 150
  bash scripts/probe_tpu.sh 4 600 || exit 1
  sleep 150  # the probe itself held the grant — full gap before the job
}

# wait for the axon relay / chip (round-3 outage pattern)
ok=0
for i in $(seq 1 120); do
  bash scripts/probe_tpu.sh 1 5; rc=$?
  [ "$rc" -eq 0 ] && { ok=1; break; }
  [ "$rc" -eq 2 ] && { echo "relay still down ($i/120)"; sleep 60; continue; }
  sleep 300  # probe hung: worker-side trouble, longer quiet
done
[ "$ok" -eq 1 ] || exit 1
sleep 150

echo "=== mesh TPU probe ($(date))"
timeout 900 python scripts/probe_mesh_tpu.py \
  > /tmp/r4_mesh_probe.json 2>/tmp/r4_mesh_probe.err
MESH_RC=$?
cat /tmp/r4_mesh_probe.json
echo "mesh probe rc=$MESH_RC"
mkdir -p runs/round4
cp /tmp/r4_mesh_probe.json runs/round4/mesh_probe.json 2>/dev/null

if [ "$MESH_RC" -eq 0 ] && grep -q '"batch": 16' /tmp/r4_mesh_probe.json; then
  handoff
  echo "=== shirt eval rows ($(date))"
  bash scripts/retry.sh 2 300 python scripts/eval_session_r3.py \
    --ckpt runs/round3/ckpt_000648.pth --only shirt \
    --out runs/round4/eval_session.jsonl --budget 2400
else
  echo "=== mesh probe FAILED — skipping shirt eval; long cooldown"
  sleep 600
fi
handoff

echo "=== regenerating train set ($(date))"
bash scripts/retry.sh 3 300 python scripts/generate_sets_r3.py \
  --sets train --batch 128 --chunk_steps 96
handoff

echo "=== launching training ($(date))"
[ -f runs/round4/latest_ckpt.pth ] || cp runs/round3/latest_ckpt.pth runs/round4/
setsid bash scripts/train_r3.sh runs/round4 256 128 \
  > /tmp/r4_train.log 2>&1 &
# pgid self-recorded by train_r3.sh (do NOT write $! here: setsid child pgid != $!)
echo "=== training launched pgid $(cat /tmp/r4_train_pgid) ($(date))"
