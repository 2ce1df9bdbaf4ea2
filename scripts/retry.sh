#!/bin/bash
# Re-exec a (resumable) TPU job until it succeeds, with a cooldown after
# each failure — a TPU worker kernel fault poisons the process's client and
# can leave the chip recovering for minutes (CLAUDE.md), so recovery is
# process-level: cooldown, re-launch, resume from durable state.
#
# Usage: scripts/retry.sh <max_tries> <cooldown_s> <cmd...>
set -u
MAX=$1; COOL=$2; shift 2
for i in $(seq 1 "$MAX"); do
  echo "[retry.sh] attempt $i/$MAX: $*" >&2
  "$@" && exit 0
  rc=$?
  echo "[retry.sh] attempt $i failed (rc=$rc); cooldown ${COOL}s" >&2
  sleep "$COOL"
done
echo "[retry.sh] giving up after $MAX attempts" >&2
exit 1
