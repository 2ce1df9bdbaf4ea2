#!/bin/bash
# Round-5 corrected second window (one chip session, no handoff gaps):
#   1. remaining fling-knob configs — lift rows RE-RUN with the aero pass
#      actually enabled (the first window's lift rows silently measured
#      base physics: drag/lift params were set but the static aero flag
#      stayed False; fixed via solver_overrides auto-enable)
#   2. 3-level oracle probe on the best config so far
#   3. chains into scripts/r5_shirt_window.sh (layered shirt probe,
#      full shirt-16 / easy-64 / large-64 eval pairs, bench)
# Usage: setsid bash scripts/r5_window2.sh [END_EPOCH] \
#          > /tmp/r5_window2.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
echo $$ > /tmp/r5_window2_pgid
END=${1:-$(( $(date +%s) + 12000 ))}
left() { echo $(( END - $(date +%s) )); }
mkdir -p runs/round5
SWEEP=runs/round5/knob_sweep.jsonl

bash scripts/probe_tpu.sh 4 600 || exit 1
sleep 150

echo "=== sweep continuation ($(date -u), $(left)s left)"
timeout $(( $(left) > 6000 ? 3600 : $(left) - 2400 )) \
  python scripts/fling_knob_sweep.py \
  --configs "lift.05,lift.15,fric.25,iters30" \
  --end $(( $(date +%s) + ($(left) > 6000 ? 3500 : $(left) - 2500) )) \
  --per_config_s 800 --out "$SWEEP" 2>&1 | grep -v WARNING
sleep 150

BEST=$(python - <<'EOF'
import json
best, name = -1.0, ""
for line in open("runs/round5/knob_sweep.jsonl"):
    d = json.loads(line)
    if d.get("levels") == 1 and d.get("mean_oracle_l1", -1) >= best:
        best, name = d["mean_oracle_l1"], d["config"]
print(name)
EOF
)
echo "=== best level-1 config: '$BEST' ($(left)s left)"
if [ -n "$BEST" ] && [ "$BEST" != "base" ] && [ "$(left)" -gt 5200 ]; then
  echo "$BEST" > runs/round5/knob_winner.txt
  echo "=== 3-level oracle on '$BEST' ($(date -u))"
  # per_config_s must be well under (end - now) or the deadline guard
  # skips the only config before it starts (bit the 2026-08-19 window:
  # guard compares remaining time to per_config_s AFTER startup costs)
  timeout 2400 python scripts/fling_knob_sweep.py \
    --configs "$BEST" --levels 3 --per_config_s 1800 \
    --end $(( $(date +%s) + 2300 )) \
    --out runs/round5/knob_winner_l3.jsonl 2>&1 | grep -v WARNING
  sleep 150
fi

exec bash scripts/r5_shirt_window.sh "$END"
