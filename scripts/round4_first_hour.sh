#!/bin/bash
# Round-4 first TPU hour: the capability evals round 3 lost to the wedged
# worker, with the handoff discipline applied (probe -> job -> wait for
# EXIT -> cooldown -> probe -> next job).
#
# Launch detached:  setsid bash scripts/round4_first_hour.sh \
#                     > /tmp/r4_first_hour.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/jaxcache

handoff() {  # quiet gap between jobs, measured from *here* (job exited)
  sleep 150
  bash scripts/probe_tpu.sh 4 600 || exit 1
  sleep 150  # the probe itself held the grant — full gap before the job
}

# wait for the axon relay to be back (round-3 outage: it can be down at
# round start until the orchestrator respawns it) — TCP checks are free
ok=0
for i in $(seq 1 120); do
  bash scripts/probe_tpu.sh 1 5; rc=$?
  [ "$rc" -eq 0 ] && { ok=1; break; }
  [ "$rc" -eq 2 ] && { echo "relay still down ($i/120)"; sleep 60; continue; }
  sleep 300  # probe hung: worker-side trouble, longer quiet
done
[ "$ok" -eq 1 ] || exit 1
sleep 150  # grant gap after the successful probe

echo "=== learning curve on hard-100 ($(date))"
bash scripts/learning_curve_r3.sh runs/round3 32 2>&1 | grep --line-buffered -v WARNING
handoff

echo "=== eval_all with final ckpt ($(date))"
bash scripts/eval_all_r3.sh runs/round3/latest_ckpt.pth 2>&1 | grep --line-buffered -v WARNING
handoff

echo "=== bench ($(date))"
bash scripts/retry.sh 3 150 python bench.py

echo "=== round-4 first hour done ($(date))"
