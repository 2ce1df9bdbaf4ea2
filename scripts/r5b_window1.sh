#!/bin/bash
# Round-5b TPU window 1: bench (TPU health + baseline) -> behavioral
# friction parity suite.  Sequential, one jax client at a time, >=150 s
# handoff between processes (CLAUDE.md single-client discipline).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p runs/round5b

echo "[w1] bench ($(date -u))"
timeout 900 python bench.py 2>&1 | tee runs/round5b/bench_w1.log
echo "[w1] bench rc=$? ($(date -u)); handoff sleep 150"
sleep 150

echo "[w1] parity suite ($(date -u))"
timeout 2700 python scripts/parity_suite.py \
  --out runs/round5b/parity_suite.jsonl 2>&1 \
  | tee runs/round5b/parity_w1.log
echo "[w1] parity rc=$? ($(date -u))"
echo "[w1] done"
