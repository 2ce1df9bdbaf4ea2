#!/bin/bash
# Round-5 kickoff: the fling-knob sweep is the round's gating measurement
# (STATUS.md "Round-5 critical path").  Runs on the TPU:
#   1. chip probe (2-min handoff rule)
#   2. fling_knob_sweep over all configs (~10 min each at 128 envs,
#      level-1 best-of-16 oracle metric, deadline-aware)
#   3. 3-level oracle probe on the best non-base config (is 0.80 now
#      reachable?)
# Leaves the chip free at END_EPOCH.
#
# Usage: setsid bash scripts/round5_first_hours.sh [END_EPOCH] \
#          > /tmp/r5_first.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
echo $$ > /tmp/r5_first_pgid
END=${1:-$(( $(date +%s) + 10800 ))}
left() { echo $(( END - $(date +%s) )); }
mkdir -p runs/round5

bash scripts/probe_tpu.sh 4 600 || exit 1
sleep 150

echo "=== knob sweep ($(date -u), $(left)s left)"
timeout $(( $(left) - 2400 )) python scripts/fling_knob_sweep.py \
  --end $(( END - 2400 )) --out runs/round5/knob_sweep.jsonl \
  2>&1 | grep -v WARNING

# pick the best config by mean_oracle_l1 (ties -> later row wins)
BEST=$(python - <<'EOF'
import json
best, name = -1.0, ""
try:
    for line in open("runs/round5/knob_sweep.jsonl"):
        d = json.loads(line)
        if d.get("mean_oracle_l1", -1) >= best:
            best, name = d["mean_oracle_l1"], d["config"]
except OSError:
    pass
print(name)
EOF
)
echo "=== best config: '$BEST' ($(left)s left)"

if [ -n "$BEST" ] && [ "$BEST" != "base" ] && [ "$(left)" -gt 2600 ]; then
  sleep 150
  echo "=== 3-level oracle on '$BEST' ($(date -u))"
  echo "$BEST" > runs/round5/knob_winner.txt
  timeout $(( $(left) - 300 )) python scripts/fling_knob_sweep.py \
    --configs "$BEST" --levels 3 --per_config_s 2400 \
    --end $(( END - 300 )) --out runs/round5/knob_winner_l3.jsonl \
    2>&1 | grep -v WARNING
fi
echo "=== round5 first hours done, chip free ($(date -u), $(left)s left)"
