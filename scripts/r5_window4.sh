#!/bin/bash
# Round-5 window 4: the headline capability pair under the friction winner.
# Waits for the fric.1 3-level oracle probe to exit, observes the >=150 s
# single-client handoff, then runs hard-100 heuristic + ckpt rows under
# dynamic_friction=0.1 in ONE jax client (no inter-job handoff).
# Usage: bash scripts/r5_window4.sh PROBE_PID [BUDGET_S]
set -u
PID=$1
BUDGET=${2:-5400}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$PID" 2>/dev/null; do sleep 15; done
echo "[w4] probe pid $PID exited ($(date -u)); handoff sleep 150s"
sleep 150
# clear stale pgid file first; verify the child actually started (ADVICE r4)
rm -f /tmp/r5w4_pgid
setsid bash -c "echo \$\$ > /tmp/r5w4_pgid; exec python scripts/eval_session_r3.py \
  --ckpt runs/round4/latest_ckpt.pth \
  --out runs/round5/eval_session.jsonl \
  --budget $BUDGET \
  --only hard/heuristic-fric1,hard/ckpt-fric1" &
for _ in $(seq 20); do [ -s /tmp/r5w4_pgid ] && break; sleep 1; done
[ -s /tmp/r5w4_pgid ] || { echo "[w4] launch failed (no pgid file)"; exit 1; }
PGID=$(cat /tmp/r5w4_pgid)
kill -0 -- -"$PGID" 2>/dev/null || { echo "[w4] pgid $PGID not alive"; exit 1; }
echo "[w4] eval session pgid $PGID, budget ${BUDGET}s"
END=$(( $(date +%s) + BUDGET + 2700 ))
while [ "$(date +%s)" -lt "$END" ]; do
  kill -0 -- -"$PGID" 2>/dev/null || { echo "[w4] eval done ($(date -u))"; exit 0; }
  sleep 30
done
echo "[w4] hard stop — killing pgid $PGID"
kill -- -"$PGID" 2>/dev/null; sleep 5
kill -0 -- -"$PGID" 2>/dev/null && kill -9 -- -"$PGID" 2>/dev/null
ps -eo pid,pgid | awk -v pg="$PGID" '$2 == pg {print $1}' | while read -r pid; do
  kill -9 "$pid" 2>/dev/null
done
echo "[w4] done ($(date -u))"
