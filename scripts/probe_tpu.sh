#!/bin/bash
# TPU health probe with wedge-aware backoff (STATUS.md round-3 lesson).
# Usage: bash scripts/probe_tpu.sh [max_attempts] [quiet_seconds]
# Exits 0 when a trivial op completes; nonzero when the chip stayed
# wedged through all attempts.  Between failed attempts the chip gets
# TOTAL quiet (no reconnects — they re-extend the bad state).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
ATTEMPTS=${1:-4}
QUIET=${2:-600}
for i in $(seq 1 "$ATTEMPTS"); do
  echo "[probe_tpu] attempt $i/$ATTEMPTS ($(date))"
  # relay-alive check first (round-3 outage): ECONNREFUSED on the axon
  # relay port means the local tunnel died — no TPU op can succeed and
  # retrying only wastes time; bail out distinctly (rc=2)
  if ! python -c "
import socket
s = socket.socket(); s.settimeout(3)
s.connect(('127.0.0.1', 8082)); s.close()" 2>/dev/null; then
    echo "[probe_tpu] relay DEAD (connect refused on 127.0.0.1:8082) — wait for infra"
    exit 2
  fi
  if timeout 150 python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/root/jaxcache')
import jax.numpy as jnp, time
t0 = time.time()
y = float((jnp.ones((1024, 1024)) @ jnp.ones((1024, 1024))).sum())
print(f'[probe_tpu] chip OK ({y:.0f}, {time.time()-t0:.1f}s)')
"; then
    exit 0
  fi
  if [ "$i" -lt "$ATTEMPTS" ]; then
    echo "[probe_tpu] hung; ${QUIET}s of total quiet"
    sleep "$QUIET"
  fi
done
echo "[probe_tpu] chip still wedged after $ATTEMPTS attempts"
exit 1
