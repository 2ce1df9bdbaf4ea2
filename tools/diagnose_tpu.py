"""One-shot TPU health diagnosis with a typed verdict (round-3 outage
postmortem, STATUS.md "TPU single-client handoff discipline").

Order of checks (cheapest first, no TPU contact until the last):
  1. relay TCP connect on 127.0.0.1:8082  -> RELAY_DEAD (rc 2)
  2. jaxcache write freshness (a live remote compile writes entries
     incrementally; silence + a hanging client = worker fault)
  3. trivial device op under a subprocess timeout
     -> OK (rc 0) | WORKER_HUNG (rc 3)

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/diagnose_tpu.py
Exit codes: 0 chip OK, 2 relay dead (wait for infra), 3 worker hung
(total quiet + re-probe), 4 unexpected failure mode.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

RELAY_PORT = 8082
JAXCACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
PROBE_TIMEOUT_S = 120

_PROBE = """
import jax
jax.config.update("jax_compilation_cache_dir", {cache!r})
import jax.numpy as jnp, time
t0 = time.time()
y = float((jnp.ones((1024, 1024)) @ jnp.ones((1024, 1024))).sum())
print(f"probe-ok {{y:.0f}} {{time.time()-t0:.1f}}s")
"""


def relay_alive(port: int = RELAY_PORT, timeout: float = 3.0) -> bool:
    s = socket.socket()
    s.settimeout(timeout)
    try:
        s.connect(("127.0.0.1", port))
        return True
    except OSError:
        return False
    finally:
        s.close()


def newest_cache_age_s(cache_dir: str = JAXCACHE):
    try:
        entries = [os.path.join(cache_dir, f) for f in os.listdir(cache_dir)]
        if not entries:
            return None
        return time.time() - max(os.path.getmtime(p) for p in entries)
    except OSError:
        return None


def main() -> int:
    verdict = {"relay": None, "cache_age_s": None, "probe": None}

    verdict["relay"] = relay_alive()
    if not verdict["relay"]:
        verdict["verdict"] = (
            "RELAY_DEAD: local axon relay is not listening — only the "
            "orchestrator can respawn it; work on CPU and wait")
        print(json.dumps(verdict))
        return 2

    age = newest_cache_age_s()
    verdict["cache_age_s"] = None if age is None else round(age, 1)

    try:
        out = subprocess.run(
            [sys.executable, "-c", _PROBE.format(cache=JAXCACHE)],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
            env=dict(os.environ,
                     PYTHONPATH="/root/repo:/root/.axon_site"))
        ok = out.returncode == 0 and "probe-ok" in out.stdout
        verdict["probe"] = "ok" if ok else f"rc={out.returncode}"
        if ok:
            verdict["verdict"] = "OK"
            print(json.dumps(verdict))
            return 0
        verdict["verdict"] = (
            "PROBE_FAILED: relay up but the device op errored — see stderr")
        verdict["stderr_tail"] = out.stderr[-500:]
        print(json.dumps(verdict))
        return 4
    except subprocess.TimeoutExpired:
        verdict["probe"] = f"hung>{PROBE_TIMEOUT_S}s"
        verdict["verdict"] = (
            "WORKER_HUNG: relay accepts but the device call never returns "
            "— worker fault; give the chip total quiet, then re-probe "
            "(healthy long compiles DO write jaxcache entries)")
        print(json.dumps(verdict))
        return 3


if __name__ == "__main__":
    sys.exit(main())
