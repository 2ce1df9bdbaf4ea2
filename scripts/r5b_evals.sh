#!/bin/bash
# Round-5b eval matrix (re-run after the 18:00 worker kernel fault killed
# job 0 of the w3 session).  Retry-wrapped: a worker fault costs one job,
# the session resumes with the remaining jobs via --only ordering + the
# jsonl-append idempotence of eval_session_r3 (done jobs simply re-run;
# keep an eye on budget).  Usage: bash scripts/r5b_evals.sh [BUDGET_S]
set -u
BUDGET=${1:-9600}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p runs/round5b
sleep 150
echo "[evals] start ($(date -u)) budget ${BUDGET}s"
timeout $(( BUDGET + 1200 )) bash scripts/retry.sh 4 180 \
  python scripts/eval_session_r3.py \
    --ckpt runs/round5b/train/latest_ckpt.pth \
    --out runs/round5b/eval_session.jsonl \
    --budget "$BUDGET" \
    --only hard/heuristic,hard/ckpt,easy/heuristic,easy/ckpt,hard/ckpt-tta,easy/ckpt-tta,shirt/heuristic,shirt/ckpt,large/heuristic,large/ckpt \
  2>&1 | tee -a runs/round5b/eval_w3.log
echo "[evals] rc=$? ($(date -u))"
