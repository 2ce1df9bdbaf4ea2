#!/bin/bash
# Round-4c chip window: runs AFTER the oracle reachability probe.
#   1. full-100 hard/heuristic row (the matched baseline the last window's
#      budget gate cut — the round-4 ckpt row already exists at n=106)
#   2. mesh re-probe: first real-TPU timing of the gather-only mesh springs
#      (the 04:51 probe predates the redesign; 450 ms/step is the OLD path)
#   3. shirt-16 eval rows, gated on the re-probe (VERDICT missing item #2)
#   4. 256-env training (train_r4b.sh) until the chip-free deadline
#
# Usage: setsid bash scripts/r4c_window.sh [END_EPOCH] \
#          > /tmp/r4c_window.log 2>&1 &
# END_EPOCH: wall deadline by which the chip must be FREE for the driver's
# bench run (default now+2h20m).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache
END=${1:-$(( $(date +%s) + 8400 ))}
left() { echo $(( END - $(date +%s) )); }
mkdir -p runs/round4

handoff() {
  sleep 150
  bash scripts/probe_tpu.sh 4 600 || exit 1
  sleep 150
}

# --- stage 0: wait for the oracle probe to release the chip ---
if [ -f /tmp/r4_oracle.pid ]; then
  OP=$(cat /tmp/r4_oracle.pid)
  for i in $(seq 1 200); do
    kill -0 "$OP" 2>/dev/null || break
    sleep 15
  done
  if kill -0 "$OP" 2>/dev/null; then
    echo "=== oracle probe still alive past its 2100s timeout; killing"
    kill -- -"$OP" 2>/dev/null; sleep 10
  fi
fi
echo "=== oracle probe done ($(date), $(left)s left)"
handoff

# --- stage 1: full-100 hard/heuristic (matched baseline for the n=106
# ckpt row already in runs/round4/eval_session.jsonl) ---
echo "=== eval A: hard/heuristic ($(date), $(left)s left)"
bash scripts/retry.sh 2 240 python scripts/eval_session_r3.py \
  --ckpt runs/round4/latest_ckpt.pth \
  --out runs/round4/eval_session.jsonl \
  --budget 1500 \
  --only "hard/heuristic" 2>&1 | grep -v WARNING
handoff

# --- stage 2: mesh re-probe (gather-only springs, first TPU timing) ---
if [ "$(left)" -gt 3000 ]; then
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

# shirt row wall estimate: ~6900 sim steps/episode-set * per_step; both
# rows under 120 ms/step + 50 min margin, ckpt-only under 250 ms.
ONLY=""
if [ "$P16" -lt 120 ] && [ "$(left)" -gt 4800 ]; then ONLY="shirt"
elif [ "$P16" -lt 250 ] && [ "$(left)" -gt 4200 ]; then ONLY="shirt/ckpt"
fi
if [ -n "$ONLY" ]; then
  echo "=== eval B: $ONLY ($(date), $(left)s left)"
  timeout 3600 \
    python scripts/eval_session_r3.py \
      --ckpt runs/round4/latest_ckpt.pth \
      --out runs/round4/eval_session.jsonl \
      --budget 3000 --only "$ONLY" 2>&1 | grep -v WARNING
  handoff
else
  echo "=== SKIP eval B (P16=$P16, $(left)s left)"
fi

# --- stage 4: 256-env collection+training to the deadline (train_r4b
# kills its own process group at END-120 and verifies the chip is free) ---
if [ "$(left)" -gt 1500 ]; then
  echo "=== training to deadline ($(date), $(left)s left)"
  bash scripts/train_r4b.sh runs/round4 $(( END - 120 )) 256 96 \
    2>&1 | tail -20
else
  echo "=== SKIP training ($(left)s left)"
fi
echo "=== r4c window done, chip free ($(date), $(left)s left)"
