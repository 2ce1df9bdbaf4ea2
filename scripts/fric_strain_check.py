"""Is low floor friction 'cheating' coverage by stretching the fabric?

The round-5 knob sweep found dynamic_friction the decisive fling knob
(fric.1: level-1 oracle 0.838 vs base 0.598), but several fric.1 task
ratios exceed 1.0 — coverage above the recorded flatten area.  Two
explanations: (a) the cloth slides flat AND the crumpled flatten pass
under-measured max_coverage (benign: the reference normalizes the same
way, tasks.py:388-401), or (b) the fling+slide plastically stretches the
fabric so it covers more area than it physically has (metric gaming — a
parity-breaking artifact).

This CPU check discriminates: one heuristic fling on the same generated
hard task under each friction, then the structural-edge strain
distribution (edge length / rest, along both grid axes) of the settled
cloth.  If p95 strain under fric.1 matches fric.75 (within the solver's
normal ~1-2% PBD residual), the coverage is real spread, not stretch.

Usage: python scripts/fric_strain_check.py [--dim 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def strain_stats(positions, dimx, dimy, spacing):
    """Structural-edge strain of the first dimy x dimx grid particles."""
    g = np.asarray(positions[: dimx * dimy]).reshape(dimy, dimx, 3)
    ex = np.linalg.norm(np.diff(g, axis=1), axis=-1) / spacing
    ey = np.linalg.norm(np.diff(g, axis=0), axis=-1) / spacing
    e = np.concatenate([ex.ravel(), ey.ravel()])
    return {"mean": float(e.mean()), "p95": float(np.percentile(e, 95)),
            "max": float(e.max())}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--frics", default="0.75,0.25,0.1")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from eval_quality import heuristic_value_maps
    from flingbot_tpu.env.batch_env import BatchSimEnv
    from flingbot_tpu.env.tasks import (
        TaskLoader, generate_randomization, write_task)

    path = os.path.join(tempfile.mkdtemp(), "tasks.hdf5")
    rng0 = np.random.default_rng(args.seed)
    task = None
    while task is None:
        task = generate_randomization(
            rng0, min_cloth_size=args.dim - 4, max_cloth_size=args.dim,
            strict_min_edge_length=args.dim - 4, task_difficulty="hard",
            max_grid_dim=args.dim)
    write_task(path, task)
    loader = TaskLoader(path, repeat=True)
    t = loader.get_next_task()
    dimx, dimy = (int(v) for v in t.cloth_size)
    max_cov = t.get_stats()["max_coverage"]

    for fric in (float(v) for v in args.frics.split(",")):
        env = BatchSimEnv(
            get_task_fn=loader.get_next_task, replay_buffer_path=None,
            num_envs=1, obs_dim=64, num_rotations=12,
            scale_factors=[1.0, 1.5, 2.0, 2.5],
            action_primitives=["fling"], episode_length=6,
            render_dim=128, max_grid_dim=args.dim,
            solver_overrides=(
                {"dynamic_friction": fric} if fric != 0.75 else None),
            seed=args.seed)
        obs = np.asarray(env.reset())
        spacing = float(np.asarray(env.topo.spacing).reshape(-1)[0])
        s0 = strain_stats(env.state.positions[0], dimx, dimy, spacing)
        vm = heuristic_value_maps(obs)
        env.step(vm)
        cov = float(np.asarray(env._chunked_simple(
            env._vm_coverage, env.state.positions, env.state.active))[0])
        s1 = strain_stats(env.state.positions[0], dimx, dimy, spacing)
        reloaded = bool(np.asarray(env.timesteps)[0] == 0)
        # a reloaded slot holds a FRESH crumpled task, not the settled
        # post-fling cloth — its coverage/strain would poison a friction
        # comparison, so null them out (ADVICE r4)
        row = {"fric": fric,
               "coverage_ratio": None if reloaded else round(cov / max_cov, 4),
               "reloaded": reloaded,
               "strain_init": {k: round(v, 4) for k, v in s0.items()},
               "strain_post_fling": (
                   None if reloaded else
                   {k: round(v, 4) for k, v in s1.items()})}
        print(json.dumps(row), flush=True)
        del env


if __name__ == "__main__":
    main()
