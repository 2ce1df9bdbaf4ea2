"""Print run_sim.py flags for a fling-knob sweep config name.

The sweep (scripts/fling_knob_sweep.py) names configs like 'damping0' or
'speed2x+damping.25'; training/eval under the winning physics needs the
same knobs as CLI flags.  Ctor overrides map to their config_parser flags;
SolverParams overrides map to one --solver_overrides JSON (runtime leaves,
aero auto-enabled by BatchSimEnv when drag/lift are nonzero).

Usage:
  python scripts/winner_flags.py damping0
  python scripts/winner_flags.py "$(cat runs/round5/knob_winner.txt)"
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from fling_knob_sweep import CONFIGS  # noqa: E402


def flags_for(name: str) -> str:
    if name not in CONFIGS:
        raise SystemExit(f"unknown config {name!r}; have {sorted(CONFIGS)}")
    ctor, params = CONFIGS[name]
    out = []
    for k, v in ctor.items():
        out.append(f"--{k} {v}")
    if params:
        # compact (no-space) JSON: the output is consumed via unquoted
        # shell word-splitting in train scripts, so it must be one word
        out.append("--solver_overrides "
                   + json.dumps(params, separators=(",", ":")))
    return " ".join(out)


if __name__ == "__main__":
    print(flags_for(sys.argv[1] if len(sys.argv) > 1 else "base"))
