#!/bin/bash
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
sleep 600   # full worker-recovery quiet after the 19:05 crash
python tools/diagnose_tpu.py 2>/dev/null | tail -2 || true
timeout 10800 bash scripts/retry.sh 3 420 \
  python scripts/eval_session_r3.py \
    --ckpt runs/round5b/train/latest_ckpt.pth \
    --out runs/round5b/eval_session.jsonl \
    --budget 8700 \
    --num_envs_override 64 \
    --only hard/heuristic,hard/ckpt,easy/heuristic,easy/ckpt,hard/ckpt-tta,easy/ckpt-tta,shirt/heuristic,shirt/ckpt,large/heuristic,large/ckpt
echo "[evals2] rc=$? ($(date -u))"
