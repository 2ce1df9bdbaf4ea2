#!/bin/bash
# Round-3 resumed session: fill in the eval rows the 2026-08-18 relay
# outage lost.  Ordering puts the fully-cached rect jobs FIRST and the
# mesh (shirt) jobs LAST so a mesh worker fault cannot take out the
# learning-curve / large-set measurements (worker recovery is 7-35 min).
#
# Launch detached:  setsid bash scripts/r3b_session.sh \
#                     > /tmp/r3b_session.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

bash scripts/probe_tpu.sh 2 300 || exit 1
sleep 150

echo "=== rect evals: large/ckpt + learning curve ($(date))"
timeout 2600 python scripts/eval_session_r3.py \
  --out runs/round3/eval_session.jsonl --budget 2200 \
  --only "large/ckpt648,hard/ckpt026,hard/ckpt198,hard/ckpt348,hard/ckpt498"
echo "=== rect evals done rc=$? ($(date))"

sleep 150
bash scripts/probe_tpu.sh 2 300 || exit 1
sleep 150

echo "=== mesh probe ($(date))"
timeout 900 python scripts/probe_mesh_tpu.py 2>&1 | tee /tmp/probe_mesh.out
echo "=== mesh probe done rc=$? ($(date))"

sleep 150
bash scripts/probe_tpu.sh 2 300 || exit 1
sleep 150

echo "=== shirt evals ($(date))"
timeout 2000 python scripts/eval_session_r3.py \
  --out runs/round3/eval_session.jsonl --budget 1700 \
  --only "shirt/heuristic,shirt/ckpt648"
echo "=== shirt evals done rc=$? ($(date))"
echo "=== r3b session done ($(date))"
