"""Fling-physics knob sweep scored by the oracle metric — round-5 priority #1.

The round-4 oracle probe (runs/round4/oracle_probe.jsonl) showed best-of-16
action selection caps at 0.648 mean coverage@3 on hard tasks (0/8 >= 0.80):
the >0.80 reference capability (README.md:21) is blocked by the fling
PRIMITIVE'S dynamics, not by policy quality.  This harness A/Bs the
candidate physics/primitive knobs using level-1 oracle coverage (best-of-K
single fling from identical states) as the metric — the cheapest
discriminator (~10 min/config at 128 envs; level 1 already separates:
0.598 vs the policy's 0.52).

Knobs swept (reference contracts in parentheses):
  fling_speed      — 6e-3 m/sim-step default (simEnv.py:55 `fling_speed`);
                     faster strokes = more inertial unfurling
  damping          — FleX viscous damping, scene sets 1.0
                     (softgym_cloth.h:166, NvFlex.h:117); high damping
                     kills the free-flight spread
  drag / lift      — cloth aero on dynamic triangles (NvFlex.h:120-122);
                     FleX main.cpp defaults are 0, but nonzero lift is how
                     real cloth 'parachutes' flat during a fling
  dynamic_friction — 0.75 scene default (softgym_cloth.h:164); lower floor
                     friction lets the cloth slide flat during the
                     drag-across-floor phase
  iterations       — 16 production vs 30 FleX parity; stiffer stretch
                     during the stroke changes how much area survives

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fling_knob_sweep.py \
      --end $(( $(date +%s) + 7200 )) --out runs/round5/knob_sweep.jsonl
CPU smoke:
  python scripts/fling_knob_sweep.py --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402

from oracle_probe import build_value_maps  # noqa: E402

# name -> (env ctor overrides, SolverParams.replace overrides)
# base first: its level-1 number anchors the comparison (expect ~0.60,
# the round-4 oracle probe's level 1 on the same tasks/seed).
CONFIGS = {
    "base": ({}, {}),
    "speed2x": ({"fling_speed": 1.2e-2}, {}),
    "speed4x": ({"fling_speed": 2.4e-2}, {}),
    "damping0": ({}, {"damping": 0.0}),
    "damping.25": ({}, {"damping": 0.25}),
    "lift.05": ({}, {"drag": 0.02, "lift": 0.05}),
    "lift.15": ({}, {"drag": 0.06, "lift": 0.15}),
    "fric.25": ({}, {"dynamic_friction": 0.25}),
    "iters30": ({"iterations": 30}, {}),
    # combo of whatever wins is round-5 follow-up, e.g.:
    "speed2x+damping.25": ({"fling_speed": 1.2e-2}, {"damping": 0.25}),
    # friction refinement around the first decisive winner (fric.25:
    # level-1 oracle 0.703 vs base 0.598, 2026-08-19) + stacking combos
    "fric.1": ({}, {"dynamic_friction": 0.1}),
    "fric.4": ({}, {"dynamic_friction": 0.4}),
    "fric.25+damping0": ({}, {"dynamic_friction": 0.25, "damping": 0.0}),
    "fric.25+lift.15": ({}, {"dynamic_friction": 0.25,
                             "drag": 0.06, "lift": 0.15}),
    "fric.25+speed2x": ({"fling_speed": 1.2e-2},
                        {"dynamic_friction": 0.25}),
    # iters30 alone scored 0.639 (+0.04) — check it stacks with friction
    # (costs 1.8x solver time; only worth it if the oracle gain holds)
    "fric.25+iters30": ({"iterations": 30}, {"dynamic_friction": 0.25}),
    # fling height — the last untested round-4 hypothesis class (speed was
    # a dud, friction decisive); adaptive lift starts at 0.3 and stops as
    # soon as the cloth clears ground, so a taller fixed stroke is a
    # genuinely different unfurl regime
    "flingh.5": ({"fixed_fling_height": 0.5}, {}),
    "fric.25+flingh.5": ({"fixed_fling_height": 0.5},
                         {"dynamic_friction": 0.25}),
    # second refinement: fric.1 hit 0.838 level-1 oracle with 5/8 tasks
    # >= 0.80 (2026-08-20) — probe below it and stack the small winners
    "fric.05": ({}, {"dynamic_friction": 0.05}),
    "fric.15": ({}, {"dynamic_friction": 0.15}),
    "fric.1+damping0": ({}, {"dynamic_friction": 0.1, "damping": 0.0}),
    "fric.1+iters30": ({"iterations": 30}, {"dynamic_friction": 0.1}),
    "fric.1+flingh.5": ({"fixed_fling_height": 0.5},
                        {"dynamic_friction": 0.1}),
    # round-5b perf QA gates: 'base' now IS the calibrated mu=0.1
    # production default, so these isolate the iteration count (PERF.md
    # lever 1 — fewer Chebyshev iterations were QUALITY-positive down to
    # 16 in round 3; 12/10 need an oracle gate before landing in bench)
    "iters12": ({"iterations": 12}, {}),
    "iters10": ({"iterations": 10}, {}),
    "iters12rho985": ({"iterations": 12}, {"chebyshev_rho": 0.985}),
}


def run_config(name, ctor_over, param_over, args, base_tasks, max_cov):
    from flingbot_tpu.env.batch_env import BatchSimEnv
    from flingbot_tpu.env.tasks import detect_mesh_caps

    if args.smoke:
        env_cfg = dict(render_dim=128, max_grid_dim=32, self_collision=False)
    else:
        env_cfg = dict(backend="pallas", spring_mode="chebyshev",
                       iterations=16, contact_mode="sort",
                       contact_iterations=4, contact_window=12,
                       contact_every=2, substeps=4, exec_mode="chunked",
                       chunk_steps=192, render_dim=256, max_grid_dim=104)
    env_cfg.update(ctor_over)

    serve = {"i": 0}

    def get_task_fn():
        t = base_tasks[(serve["i"] // args.cands) % len(base_tasks)]
        serve["i"] += 1
        return t

    env = BatchSimEnv(
        get_task_fn=get_task_fn, replay_buffer_path=None,
        num_envs=len(base_tasks) * args.cands, obs_dim=64, num_rotations=12,
        scale_factors=[1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5, 2.75],
        action_primitives=["fling"], episode_length=6,
        mesh_caps=detect_mesh_caps(args.tasks), domain_randomization=True,
        seed=args.seed,
        # via the ctor (not a post-hoc params.replace) so nonzero drag/lift
        # auto-enable the aero pass — without it the lift configs silently
        # measure base physics (the 2026-08-19 sweep-window bug)
        solver_overrides=param_over or None,
        **env_cfg)

    T = len(base_tasks)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    obs = np.asarray(env.reset())
    running_best = None  # oracle@k is a running max across levels
    levels_done = 0
    for level in range(args.levels):
        # per-level deadline: a 3-level config is ~3x a sweep row; record
        # the levels that finished rather than overrun the chip window.
        # Checked before level 0 too so a late start exits with an explicit
        # skipped row instead of overrunning by a full level (ADVICE r4)
        if args.end and time.time() > args.end:
            print(f"[sweep] {name}: stopping at level {level} (deadline)",
                  flush=True)
            break
        vm = build_value_maps(obs, T, args.cands, rng)
        env.step(vm)
        cov = np.asarray(env._chunked_simple(
            env._vm_coverage, env.state.positions, env.state.active))
        ratio = cov.reshape(T, args.cands) / max_cov[:, None]
        # exclude reloaded (no-move early exit) envs from the argmax —
        # their coverage is a fresh crumpled state, not a fling outcome
        reloaded = (np.asarray(env.timesteps) == 0).reshape(ratio.shape)
        ratio = np.where(reloaded & ~reloaded.all(axis=1, keepdims=True),
                         -1.0, ratio)
        best = ratio.max(axis=1)
        running_best = best if running_best is None \
            else np.maximum(running_best, best)
        levels_done = level + 1
        if level + 1 < args.levels:
            # broadcast each group's best state/topology to the group
            sel = np.arange(T) * args.cands + ratio.argmax(axis=1)
            idx = jnp.asarray(np.repeat(sel, args.cands))
            env.state = jax.tree_util.tree_map(lambda x: x[idx], env.state)
            env.topo = jax.tree_util.tree_map(lambda x: x[idx], env.topo)
            env._observe()
            obs = np.asarray(env.obs.obs_stack)
    row = {"config": name, "ctor": ctor_over, "params": param_over,
           "levels": levels_done,
           "oracle_l1": [round(float(v), 4) for v in running_best],
           "mean_oracle_l1": round(float(running_best.mean()), 4),
           "ge_080": int((running_best >= 0.80).sum()),
           "seconds": round(time.time() - t0, 1)}
    del env
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", default="data_r3/rect_eval_hard_100.hdf5")
    p.add_argument("--num_tasks", type=int, default=8)
    p.add_argument("--cands", type=int, default=16)
    p.add_argument("--levels", type=int, default=1,
                   help="fling levels per config (1 for the sweep; 3 to "
                        "re-score a winner like the oracle probe)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--configs", default=None,
                   help="comma-separated config names (default: all)")
    p.add_argument("--end", type=int, default=None,
                   help="epoch deadline; configs are skipped when < "
                        "--per_config_s remain")
    p.add_argument("--per_config_s", type=int, default=900)
    p.add_argument("--out", default=None)
    p.add_argument("--smoke", action="store_true")
    args = p.parse_args()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
        import tempfile

        from flingbot_tpu.env.tasks import generate_randomization, write_task

        args.num_tasks, args.cands = 2, 2
        path = os.path.join(tempfile.mkdtemp(), "tasks.hdf5")
        rng0 = np.random.default_rng(0)
        wrote = 0
        while wrote < args.num_tasks:
            task = generate_randomization(
                rng0, min_cloth_size=24, max_cloth_size=32,
                strict_min_edge_length=24, task_difficulty="hard",
                max_grid_dim=32)
            if task is not None:
                write_task(path, task)
                wrote += 1
        args.tasks = path
        if args.configs is None:
            args.configs = "base,speed2x,damping.25"

    from flingbot_tpu.env.tasks import TaskLoader

    loader = TaskLoader(args.tasks, repeat=True)
    base_tasks = [loader.get_next_task() for _ in range(args.num_tasks)]
    max_cov = np.array(
        [t.get_stats()["max_coverage"] for t in base_tasks], np.float64)

    names = (args.configs.split(",") if args.configs else list(CONFIGS))
    for name in names:
        if name not in CONFIGS:
            raise SystemExit(f"unknown config {name!r}; "
                             f"have {sorted(CONFIGS)}")
        if args.end and args.end - time.time() < args.per_config_s:
            print(f"[sweep] SKIP {name} (deadline)", flush=True)
            continue
        row = run_config(name, *CONFIGS[name], args, base_tasks, max_cov)
        print(json.dumps(row), flush=True)
        if args.out:
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
    print("[sweep] done", flush=True)


if __name__ == "__main__":
    main()
