"""Render runs/*/eval_session.jsonl into the STATUS.md markdown tables.

Two tables:
  * held-out set table — one row per (set, policy) with init coverage,
    best-coverage@3 mean (the reference's headline "coverage within 3
    actions", README.md:21), and episode delta coverage;
  * learning curve — best-coverage@3 on the hard set per checkpoint.

Usage:  python tools/eval_table.py [runs/round3/eval_session.jsonl]
"""
from __future__ import annotations

import json
import sys
from collections import OrderedDict


def load(path: str) -> "OrderedDict[str, dict]":
    rows: "OrderedDict[str, dict]" = OrderedDict()
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            key = d.get("job") or f"{d.get('tasks')}/{d.get('policy')}"
            rows[key] = d  # later rows (reruns) win
    return rows


def stat(d: dict, prefix: str, suffix: str = "mean"):
    for k, v in d.items():
        if k.startswith(prefix) and k.endswith("/" + suffix):
            return v
    return None


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "runs/round3/eval_session.jsonl"
    rows = load(path)

    print("| job | eps | init cov | best cov@3 | Δcov | %Δ>0 |")
    print("|---|---|---|---|---|---|")
    curve = []
    for key, d in rows.items():
        init = stat(d, "init_coverage/")
        best = stat(d, "best_coverage/")
        delta = stat(d, "episode_delta_coverage/")
        pos = next((v for k, v in d.items()
                    if k.endswith("percent_positive")), None)
        fmt = lambda v: f"{v:.4f}" if isinstance(v, float) else "—"
        print(f"| {key} | {d.get('episodes')} | {fmt(init)} | {fmt(best)} "
              f"| {fmt(delta)} | {fmt(pos)} |")
        if key.startswith("hard/ckpt"):
            curve.append((key.split("ckpt")[-1], best))

    if len(curve) > 1:
        print("\nLearning curve (hard set, best cov@3 by optimizer step):")
        print("| ckpt step | best cov@3 |")
        print("|---|---|")
        for step, best in sorted(curve, key=lambda t: int(t[0])):
            print(f"| {int(step)} | {best:.4f} |")


if __name__ == "__main__":
    main()
