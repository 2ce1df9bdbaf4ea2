#!/bin/bash
# Follow-up to the fric.1 3-level oracle probe: once that python process
# exits, observe the >=150 s single-client handoff (CLAUDE.md), then run
# one more refinement row (fric.15 level-1) if >=10 min remain before the
# window deadline.  Usage: bash scripts/r5_window3b.sh PROBE_PID END_EPOCH
set -u
PID=$1
END=$2
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

while kill -0 "$PID" 2>/dev/null; do sleep 15; done
echo "[w3b] probe pid $PID exited ($(date -u)); handoff sleep 150s"
sleep 150
LEFT=$(( END - $(date +%s) ))
if [ "$LEFT" -lt 600 ]; then
  echo "[w3b] only ${LEFT}s left — skipping fric.15 row"
  exit 0
fi
echo "[w3b] running fric.15 level-1 (${LEFT}s budget)"
# clear the pgid file BEFORE launching so a failed start can't leave us
# monitoring a stale pid from a prior run (ADVICE r4)
rm -f /tmp/r5w3b_pgid
setsid bash -c "echo \$\$ > /tmp/r5w3b_pgid; exec python scripts/fling_knob_sweep.py --levels 1 --configs fric.15 --end $END --per_config_s 60 --out runs/round5/knob_sweep.jsonl" &
for _ in $(seq 20); do [ -s /tmp/r5w3b_pgid ] && break; sleep 1; done
[ -s /tmp/r5w3b_pgid ] || { echo "[w3b] launch failed (no pgid file)"; exit 1; }
PGID=$(cat /tmp/r5w3b_pgid)
kill -0 -- -"$PGID" 2>/dev/null || { echo "[w3b] pgid $PGID not alive"; exit 1; }
while [ "$(date +%s)" -lt "$END" ]; do
  kill -0 -- -"$PGID" 2>/dev/null || { echo "[w3b] row done ($(date -u))"; exit 0; }
  sleep 15
done
echo "[w3b] deadline — killing pgid $PGID"
kill -- -"$PGID" 2>/dev/null; sleep 5
kill -0 -- -"$PGID" 2>/dev/null && kill -9 -- -"$PGID" 2>/dev/null
# GNU timeout children escape the group (CLAUDE.md) — pid-scan the group
ps -eo pid,pgid | awk -v pg="$PGID" '$2 == pg {print $1}' | while read -r pid; do
  kill -9 "$pid" 2>/dev/null
done
echo "[w3b] done ($(date -u))"
