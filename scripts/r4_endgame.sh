#!/bin/bash
# Round-4 endgame: one consolidated TPU window that replaces the separate
# midround-window + finalize scripts (the round deadline leaves no time for
# two pause/resume cycles).  Stages, each deadline-guarded:
#   1. stop training
#   2. perf sweep (trimmed: 16/12/10 iterations x 2 contact configs + rho)
#   3. mesh re-probe (gather-only springs) -> gates the shirt eval rows
#   4. fling-QA gate rows (16 reference + 12 candidate, same seed/set/code)
#   5. offline pass (dihedral augmentation) on the collected buffer
#   6. ONE eval_session under a single grant: hard pair -> shirt pair ->
#      learning curve -> easy/large, per-episode distributions for CIs
#   7. short bench validation
#
# Usage:  setsid bash scripts/r4_endgame.sh [DEADLINE_EPOCH] \
#           > /tmp/r4_endgame.log 2>&1 &
# DEADLINE_EPOCH defaults to now + 4h45m.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
DEADLINE=${1:-$(( $(date +%s) + 17100 ))}
mkdir -p runs/round4

left() { echo $(( DEADLINE - $(date +%s) )); }

handoff() {
  sleep 150
  bash scripts/probe_tpu.sh 4 600 || exit 1
  sleep 150
}

if [ -f /tmp/r4_train_pgid ]; then
  kill -- -"$(cat /tmp/r4_train_pgid)" 2>/dev/null
  echo "=== training stopped ($(date), $(left)s left)"
fi
handoff

if [ "$(left)" -gt 12600 ]; then
  echo "=== perf sweep ($(date), $(left)s left)"
  timeout 2700 python scripts/perf_sweep_r3.py \
      --iters 16,12,10 --contacts 4:12,6:12 2>&1 \
    | grep -v WARNING | tee runs/round4/perf_sweep.json
  handoff
else
  echo "=== SKIP perf sweep ($(left)s left)"
fi

echo "=== mesh re-probe, gather-only springs ($(date), $(left)s left)"
timeout 1500 python scripts/probe_mesh_tpu.py \
  > runs/round4/mesh_probe2.json 2>/tmp/r4_mesh_probe2.err
MESH_RC=$?
cat runs/round4/mesh_probe2.json
# shirt rows only if a 32-step batch-16 chunk stays well under the
# worker-fault wall (~50 s/call): per_step_ms < 780
SHIRT_OK=$(python - <<'EOF'
import json
ok = False
try:
    for line in open("runs/round4/mesh_probe2.json"):
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
echo "=== mesh probe rc=$MESH_RC shirt_ok=$SHIRT_OK"
handoff

if [ "$(left)" -gt 10800 ]; then
  QA_COMMON="--tasks data/rect_eval_tasks.hdf5 --policy heuristic --steps 3 \
    --num_envs 16 --episodes 16 --seed 7 --num_rotations 12 \
    --scale_factors 1.0 1.25 1.5 1.75 2.0 2.25 2.5 2.75 \
    --backend pallas --spring_mode chebyshev --contact_mode sort \
    --exec_mode chunked --chunk_steps 192 --contact_every 2 \
    --contact_iterations 4 --contact_window 12"
  for IT in 16 12; do
    echo "=== QA gate iterations=$IT ($(date), $(left)s left)"
    bash scripts/retry.sh 2 150 python eval_quality.py $QA_COMMON \
      --iterations "$IT" 2>&1 | grep -v WARNING | tail -3 \
      | tee -a runs/round4/qa_gate.log
    handoff
  done
else
  echo "=== SKIP QA gates ($(left)s left)"
fi

OFFLINE_STEPS=1200
[ "$(left)" -lt 9000 ] && OFFLINE_STEPS=600
echo "=== offline pass: $OFFLINE_STEPS steps, dihedral ($(date), $(left)s left)"
bash scripts/retry.sh 3 150 python scripts/offline_train_r3.py \
  --log runs/round4 --steps "$OFFLINE_STEPS" --batch_size 128 \
  --dihedral_augment --save_every 300
handoff

# eval session: budget = time left minus 35 min for bench + driver slack
EVAL_BUDGET=$(( $(left) - 2100 ))
[ "$EVAL_BUDGET" -lt 600 ] && EVAL_BUDGET=600
ONLY="hard/heuristic,shirt,hard/ckpt,easy,large"
[ "$SHIRT_OK" = "yes" ] || ONLY="hard/heuristic,hard/ckpt,easy,large"
# learning-curve ckpts: earliest + latest-but-one numbered round-4 ckpts
CURVE=$(ls runs/round4/ckpt_*.pth 2>/dev/null | sort | sed -n '1p;$p' \
        | paste -sd, -)
echo "=== eval session (budget ${EVAL_BUDGET}s, only=$ONLY, curve=$CURVE)"
bash scripts/retry.sh 2 300 python scripts/eval_session_r3.py \
  --ckpt runs/round4/latest_ckpt.pth \
  --out runs/round4/eval_session.jsonl \
  --budget "$EVAL_BUDGET" --only "$ONLY" \
  ${CURVE:+--curve "$CURVE"} 2>&1 | grep -v WARNING
handoff

echo "=== bench validation ($(date), $(left)s left)"
timeout 1500 python bench.py | tee runs/round4/bench_endgame.json
echo "=== endgame done ($(date), $(left)s left)"
