#!/bin/bash
# Round-5 second chip window (after round5_first_hours.sh frees the chip):
#   1. chip probe + handoff discipline
#   2. layered shirt-path timing probe (the round-5 mesh-10x redesign:
#      LayeredGridTopology stencil solve — expect grid-class per-step cost
#      vs the 133 ms/step mesh gather path, runs/round4/mesh_probe2.json)
#   3. FULL shirt-16 eval pair (heuristic + ckpt) through the layered path
#      — the first full-n shirt coverage@3 numbers (VERDICT r3 missing #2)
#   4. easy-64 + large-64 full pairs (completes the matched eval matrix)
#   5. bench.py
# Usage: setsid bash scripts/r5_shirt_window.sh [END_EPOCH] \
#          > /tmp/r5_shirt.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
echo $$ > /tmp/r5_shirt_pgid
END=${1:-$(( $(date +%s) + 7200 ))}
left() { echo $(( END - $(date +%s) )); }
CKPT=runs/round4/latest_ckpt.pth
OUT=runs/round5/eval_session.jsonl
mkdir -p runs/round5

bash scripts/probe_tpu.sh 4 600 || exit 1
sleep 150

echo "=== layered shirt probe ($(date -u), $(left)s left)"
timeout 900 python scripts/probe_mesh_tpu.py --layout layered \
  --backend xla 2>&1 | grep -v WARNING | tee runs/round5/layered_probe.json
sleep 150

if [ "$(left)" -gt 2400 ]; then
  echo "=== shirt-16 full pair ($(date -u), $(left)s left)"
  timeout $(( $(left) > 3600 ? 3000 : $(left) - 600 )) \
    python scripts/eval_session_r3.py --ckpt "$CKPT" --out "$OUT" \
    --budget 2800 --only "shirt/ckpt,shirt/heuristic" \
    2>&1 | grep -v WARNING
  sleep 150
fi

if [ "$(left)" -gt 1800 ]; then
  # the fric.25 capability preview outranks the easy/large fill-ins: it is
  # the first held-out number under the sweep-winner physics
  echo "=== fric25 heuristic preview ($(date -u), $(left)s left)"
  timeout $(( $(left) - 900 )) \
    python scripts/eval_session_r3.py --ckpt "$CKPT" --out "$OUT" \
    --budget $(( $(left) - 1100 )) \
    --only "hard/heuristic-fric25" 2>&1 | grep -v WARNING
  sleep 150
fi

if [ "$(left)" -gt 2400 ]; then
  echo "=== easy/large full pairs ($(date -u), $(left)s left)"
  timeout $(( $(left) - 900 )) \
    python scripts/eval_session_r3.py --ckpt "$CKPT" --out "$OUT" \
    --budget $(( $(left) - 1000 )) \
    --only "easy/heuristic,easy/ckpt,large/heuristic,large/ckpt" \
    2>&1 | grep -v WARNING
  sleep 150
fi

if [ "$(left)" -gt 700 ]; then
  echo "=== bench ($(date -u), $(left)s left)"
  timeout 650 python bench.py 2>&1 | grep -v WARNING | tee /tmp/r5_bench.json
fi
echo "=== r5 shirt window done, chip free ($(date -u), $(left)s left)"
