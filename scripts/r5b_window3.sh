#!/bin/bash
# Round-5b TPU window 3: full eval matrix under the calibrated production
# physics with the freshly trained checkpoint, then layered shirt timing,
# perf probe, and the final bench.  Waits for window 2 (trainer) to exit
# first.  Usage: bash scripts/r5b_window3.sh [EVAL_BUDGET_S]
set -u
BUDGET=${1:-8400}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
mkdir -p runs/round5b

# wait for the window-2 wrapper to finish (it kills the trainer at its
# deadline), then observe the single-client handoff
while pgrep -f "r5b_window2.sh" > /dev/null; do sleep 30; done
echo "[w3] window 2 gone ($(date -u)); handoff sleep 180"
sleep 180

CKPT=runs/round5b/train/latest_ckpt.pth
if [ ! -f "$CKPT" ]; then
  echo "[w3] WARNING: $CKPT missing — falling back to round-4 ckpt"
  CKPT=runs/round4/latest_ckpt.pth
else
  # offline optimize epochs on the final buffer (same supervised loss;
  # round-3 measured the offline pass doing most of the value-net
  # calibration).  ~8 effective epochs at 10k transitions.
  cp "$CKPT" runs/round5b/train/latest_online_ckpt.pth
  echo "[w3] offline pass ($(date -u))"
  timeout 1800 python scripts/offline_train_r3.py \
    --log runs/round5b/train --steps 600 --save_every 200 \
    --dihedral_augment 2>&1 | tee runs/round5b/offline_w3.log
  echo "[w3] offline rc=$?; handoff sleep 150"
  sleep 150
fi

echo "[w3] eval session (ckpt $CKPT, budget ${BUDGET}s, $(date -u))"
timeout $(( BUDGET + 2400 )) python scripts/eval_session_r3.py \
  --ckpt "$CKPT" \
  --out runs/round5b/eval_session.jsonl \
  --budget "$BUDGET" \
  --only hard/heuristic,hard/ckpt,easy/heuristic,easy/ckpt,hard/ckpt-tta,easy/ckpt-tta,shirt/heuristic,shirt/ckpt,large/heuristic,large/ckpt \
  2>&1 | tee runs/round5b/eval_w3.log
echo "[w3] eval rc=$? ($(date -u)); handoff sleep 150"
sleep 150

echo "[w3] layered shirt probe ($(date -u))"
timeout 1500 python scripts/probe_mesh_tpu.py --layout layered \
  2>&1 | tee runs/round5b/layered_probe_w3.log
echo "[w3] layered rc=$?; handoff sleep 150"
sleep 150

echo "[w3] perf probe ($(date -u))"
timeout 2400 python scripts/perf_probe_r5.py \
  --out runs/round5b/perf_probe.jsonl 2>&1 | tee runs/round5b/perf_w3.log
echo "[w3] perf rc=$?; handoff sleep 150"
sleep 150

echo "[w3] iters QA gate ($(date -u))"
QA_END=$(( $(date +%s) + 1800 ))
timeout 2100 python scripts/fling_knob_sweep.py \
  --levels 1 --configs base,iters12 --end "$QA_END" --per_config_s 700 \
  --out runs/round5b/iters_qa.jsonl 2>&1 | tee runs/round5b/iters_qa.log
echo "[w3] QA rc=$?; handoff sleep 150"
sleep 150

echo "[w3] final bench ($(date -u))"
timeout 900 python bench.py 2>&1 | tee runs/round5b/bench_w3.log
echo "[w3] bench rc=$?; FleX-parity row (no handoff: same process family,"
echo "     separate client — sleep 150 anyway)"
sleep 150
timeout 900 python bench.py --iterations 30 2>&1 \
  | tee runs/round5b/bench_w3_flexparity.log
echo "[w3] done ($(date -u))"
