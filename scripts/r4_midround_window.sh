#!/bin/bash
# Round-4 mid-round chip window: pause training, run (1) the perf sweep
# incl. 12/10-iteration + rho rows, (2) fling-QA gates for the fastest
# sweep candidates, (3) the mesh re-probe on the gather-only spring solve,
# (4) the first shirt coverage@3 rows if the probe says the cost is sane,
# then resume training.  One window amortizes the 2x150 s handoff tax
# across all four jobs.
#
# Launch detached:  setsid bash scripts/r4_midround_window.sh \
#                     > /tmp/r4_window.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

handoff() {
  sleep 150
  bash scripts/probe_tpu.sh 4 600 || exit 1
  sleep 150
}

if [ -f /tmp/r4_train_pgid ]; then
  kill -- -"$(cat /tmp/r4_train_pgid)" 2>/dev/null
  echo "=== training paused ($(date))"
fi
handoff

echo "=== perf sweep ($(date))"
timeout 2400 python scripts/perf_sweep_r3.py 2>&1 | grep -v WARNING \
  | tee /tmp/r4_perf_sweep.json
handoff

# QA gate: heuristic fling quality on the round-1 16-task set at the two
# fastest configs that held hang-stretch (production 16/4/12 is the
# reference row; re-run it too so the comparison shares code+seed)
QA_COMMON="--tasks data/rect_eval_tasks.hdf5 --policy heuristic --steps 3 \
  --num_envs 16 --episodes 16 --seed 7 --num_rotations 12 \
  --scale_factors 1.0 1.25 1.5 1.75 2.0 2.25 2.5 2.75 \
  --backend pallas --spring_mode chebyshev --contact_mode sort \
  --exec_mode chunked --chunk_steps 192 --contact_every 2"
for CFG in "16 4 12" "12 4 12" "10 4 12"; do
  set -- $CFG
  echo "=== QA gate iters=$1 c_it=$2 c_win=$3 ($(date))"
  bash scripts/retry.sh 2 150 python eval_quality.py $QA_COMMON \
    --iterations "$1" --contact_iterations "$2" --contact_window "$3" \
    2>&1 | grep -v WARNING | tail -3
  sleep 150
done
bash scripts/probe_tpu.sh 4 600 || exit 1
sleep 150

echo "=== mesh re-probe (gather-only springs, tight caps) ($(date))"
timeout 1200 python scripts/probe_mesh_tpu.py \
  > /tmp/r4_mesh_probe2.json 2>/tmp/r4_mesh_probe2.err
MESH_RC=$?
cat /tmp/r4_mesh_probe2.json
cp /tmp/r4_mesh_probe2.json runs/round4/mesh_probe2.json 2>/dev/null

# shirt rows only if the probe finished AND batch-16 per-step cost keeps a
# 32-step chunk under ~25 s (i.e. per_step_ms < 780)
OK=$(python - <<'EOF'
import json
ok = False
try:
    for line in open("/tmp/r4_mesh_probe2.json"):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("batch") == 16 and d.get("per_step_ms", 1e9) < 780:
            ok = True
except OSError:
    pass
print("yes" if ok else "no")
EOF
)
if [ "$MESH_RC" -eq 0 ] && [ "$OK" = "yes" ]; then
  handoff
  echo "=== shirt eval rows ($(date))"
  CKPT=runs/round4/latest_ckpt.pth
  [ -f "$CKPT" ] || CKPT=runs/round3/ckpt_000648.pth
  bash scripts/retry.sh 2 300 python scripts/eval_session_r3.py \
    --ckpt "$CKPT" --only shirt \
    --out runs/round4/eval_session.jsonl --budget 7200
else
  echo "=== mesh still too slow or probe failed (rc=$MESH_RC ok=$OK) — no shirt rows this window"
fi
handoff

echo "=== resuming training ($(date))"
setsid bash scripts/train_r3.sh runs/round4 256 128 \
  >> /tmp/r4_train.log 2>&1 &
# pgid self-recorded by train_r3.sh (do NOT write $! here: setsid child pgid != $!)
echo "=== training resumed pgid $(cat /tmp/r4_train_pgid) ($(date))"
