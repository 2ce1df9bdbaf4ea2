"""First shirt coverage@3 rows at small n — the largest width the mesh
path's measured TPU speed affords in a short window.

The full shirt-16 eval at num_envs=16 is ~3.6 h at the re-probed
1.88 s/step (runs/round4/mesh_probe2.json); at num_envs=2 the same probe
measured 133 ms/step, making a 2-task x 3-action episode set ~18 min.
This runs shirt/heuristic at n=2 first, then shirt/ckpt if the deadline
allows, appending rows to the shared eval_session.jsonl.  Matches the
shirt eval protocol of /root/reference/README.md:136-141 (held-out
Cloth3D-style shirts, coverage within 3 actions) at reduced n.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/shirt_eval_small.py \
    [END_EPOCH] [--out runs/round4/eval_session.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eval_session_r3 import run_eval  # noqa: E402  (configures jax cache)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    end = int(args[0]) if args else int(time.time()) + 2700
    out = "runs/round4/eval_session.jsonl"
    offset = 0
    for i, a in enumerate(sys.argv):
        if a == "--out":
            out = sys.argv[i + 1]
        if a == "--task_offset":
            offset = int(sys.argv[i + 1])

    jobs = [
        # trained-policy row first: the reference's headline shirt metric
        # is policy coverage@3 (README.md:136-141); with a short window the
        # single row that fits should be the policy one
        dict(name=f"shirt/ckpt-n2-off{offset}",
             tasks="data_r3/shirt_eval_16.hdf5",
             policy="ckpt", load="runs/round4/latest_ckpt.pth",
             episodes=2, num_envs=2, task_offset=offset),
        dict(name=f"shirt/heuristic-n2-off{offset}",
             tasks="data_r3/shirt_eval_16.hdf5",
             policy="heuristic", load=None, episodes=2, num_envs=2,
             task_offset=offset),
    ]
    for i, job in enumerate(jobs):
        left = end - time.time()
        # with a warm compile cache a 2-env shirt row runs in ~420-570 s
        # (measured 15:14-15:32 window); cold compiles add ~300 s
        warm = os.environ.get("SHIRT_EVAL_WARM") == "1"
        need = (620 if warm else 1500) if i == 0 else 520
        if left < need:
            print(f"[shirt_small] SKIP {job['name']} ({left:.0f}s left, "
                  f"need {need})", flush=True)
            continue
        print(f"=== {job['name']} ({left:.0f}s left)", flush=True)
        res = run_eval(**job)
        with open(out, "a") as f:
            f.write(json.dumps(res) + "\n")
        print(json.dumps(res), flush=True)
    print("[shirt_small] done", flush=True)


if __name__ == "__main__":
    main()
