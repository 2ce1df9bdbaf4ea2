#!/bin/bash
# Round-4 LAST chip window (~90 min): the trimmed endgame for a late start.
# Differences vs r4_endgame.sh (which assumes 4h45m):
#   - no perf sweep, no QA gates, no bench (the driver runs bench.py itself
#     at round end), NO offline pass (only 311 fresh transitions this round
#     after the 256-env OOM loop ate the collection window; a 600-step
#     offline pass over 311 samples is an overfit risk and costs ~22 min
#     incl. handoff -- documented in STATUS.md).
#   - full-100 hard pair FIRST (the north-star eval), mesh probe + shirt
#     rows LAST (a mesh worker fault costs 15-35 min recovery; nothing of
#     value runs after shirts).
#
# Usage: setsid bash scripts/r4_lastwindow.sh [END_EPOCH] \
#          > /tmp/r4_lastwindow.log 2>&1 &
# END_EPOCH: wall deadline by which the chip must be FREE (default now+85m).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
END=${1:-$(( $(date +%s) + 5100 ))}
left() { echo $(( END - $(date +%s) )); }
mkdir -p runs/round4

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

# --- stage 1: full-100 held-out hard pair (round-4 ckpt FIRST: if the
# budget gate cuts the second job, the round-4 policy number must exist) ---
echo "=== eval A: hard pair ($(date), $(left)s left)"
bash scripts/retry.sh 2 240 python scripts/eval_session_r3.py \
  --ckpt runs/round4/latest_ckpt.pth \
  --out runs/round4/eval_session.jsonl \
  --budget $(( $(left) - 2100 > 600 ? $(left) - 2100 : 600 )) \
  --only "hard/ckpt,hard/heuristic" 2>&1 | grep -v WARNING
handoff

# --- stage 2: mesh re-probe (gather-only springs) gates the shirt rows ---
if [ "$(left)" -gt 1500 ]; then
  echo "=== mesh re-probe ($(date), $(left)s left)"
  timeout 900 python scripts/probe_mesh_tpu.py \
    > runs/round4/mesh_probe2.json 2>/tmp/r4_mesh_probe2.err
  cat runs/round4/mesh_probe2.json
  handoff
else
  echo "=== SKIP mesh probe ($(left)s left)"
fi

P16=$(python - <<'EOF'
import json
best = 1e9
try:
    for line in open("runs/round4/mesh_probe2.json"):
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if d.get("batch") == 16:
            best = min(best, d.get("per_step_ms", 1e9))
except OSError:
    pass
print(int(best))
EOF
)
echo "=== mesh batch-16 per_step_ms=$P16 ($(left)s left)"

# shirt row wall estimate: ~6900 sim steps/episode-set * per_step; run both
# rows under 120 ms/step, ckpt-only under 250, else fall back to easy pair.
ONLY=""
if [ "$P16" -lt 120 ] && [ "$(left)" -gt 2100 ]; then ONLY="shirt"
elif [ "$P16" -lt 250 ] && [ "$(left)" -gt 1500 ]; then ONLY="shirt/ckpt"
elif [ "$(left)" -gt 1800 ]; then ONLY="easy"
fi
if [ -n "$ONLY" ]; then
  echo "=== eval B: $ONLY ($(date), $(left)s left)"
  timeout "$(( $(left) - 300 ))" \
    python scripts/eval_session_r3.py \
      --ckpt runs/round4/latest_ckpt.pth \
      --out runs/round4/eval_session.jsonl \
      --budget $(( $(left) - 600 )) --only "$ONLY" 2>&1 | grep -v WARNING
else
  echo "=== SKIP eval B (P16=$P16, $(left)s left)"
fi
echo "=== last window done, chip free ($(date), $(left)s left)"
