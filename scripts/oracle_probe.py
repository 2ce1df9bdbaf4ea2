"""Greedy best-of-K oracle probe: is >0.80 coverage@3 REACHABLE with the
current physics + fling primitive?

The north-star capability number (reference README.md:21 — ">80% coverage
within 3 actions") has been stuck at ~0.54 for two rounds while the
learning curve stays flat.  Before spending more chip-hours on data scale,
this probe measures the *environment's* ceiling directly: for each task it
executes C candidate fling actions IN PARALLEL (the task replicated across
C adjacent envs of one BatchSimEnv), keeps the best-coverage outcome,
broadcasts that state to the whole group, and repeats for L levels — a
greedy width-C tree search over the real action space.

  oracle@3 >> 0.8  -> the primitive/physics can flatten; the gap is
                      policy quality (data volume is the binding
                      constraint, keep collecting).
  oracle@3 ~~ 0.6  -> the primitive or the solver config is the ceiling;
                      data scale CANNOT close the gap (fix fling params /
                      stiffness / action space first).

Candidate k of each group interpolates between the centroid-distance
heuristic map (eval_quality.heuristic_value_maps) and uniform noise:
t = k/(C-1); vm_k = (1-t)*heuristic + t*uniform.  k=0 is the pure
heuristic, k=C-1 a uniformly-random VALID action (select_action masks
cloth/reach/bounds internally, action.py).  Coverage ratios are
normalized by the task's flatten_area (tasks.Task.get_stats max_coverage).

Wall cost: levels x one fling-program per env batch — at 128 envs pallas
scales linearly, so ~9 min/level regardless of (tasks x cands) split
(round-3 perf facts, CLAUDE.md).  Programs are compile-cache hits from the
128-env training runs.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/oracle_probe.py \
      --tasks data_r3/rect_eval_hard_100.hdf5 --num_tasks 8 --cands 16 \
      --out runs/round4/oracle_probe.jsonl
CPU smoke (tiny generated task):
  python scripts/oracle_probe.py --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402


def build_value_maps(obs_stack: np.ndarray, num_tasks: int, cands: int,
                     rng: np.random.Generator) -> np.ndarray:
    """(B, T, 4, D, D) obs -> (B, 1, T, D, D) candidate maps."""
    from eval_quality import heuristic_value_maps

    heur = heuristic_value_maps(obs_stack)  # (B, 1, T, D, D)
    noise = rng.random(heur.shape).astype(np.float32)
    # per-env interpolation weight: candidate k of every group gets
    # t = k/(C-1) (0 = pure heuristic ... 1 = pure random-valid)
    t = np.tile(np.linspace(0.0, 1.0, cands, dtype=np.float32), num_tasks)
    t = t[: heur.shape[0], None, None, None, None]
    return (1.0 - t) * heur + t * noise


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", default="data_r3/rect_eval_hard_100.hdf5")
    p.add_argument("--num_tasks", type=int, default=8)
    p.add_argument("--cands", type=int, default=16)
    p.add_argument("--levels", type=int, default=3)
    p.add_argument("--task_offset", type=int, default=0,
                   help="skip the first N tasks of the set")
    p.add_argument("--out", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="CPU plumbing test: tiny generated cloth, 2 tasks "
                        "x 2 cands x 1 level, self_collision off")
    args = p.parse_args()

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    from flingbot_tpu.env.batch_env import BatchSimEnv
    from flingbot_tpu.env.tasks import TaskLoader, detect_mesh_caps

    if args.smoke:
        import tempfile

        from flingbot_tpu.env.tasks import generate_randomization, write_task

        args.num_tasks, args.cands, args.levels = 2, 2, 1
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
        env_cfg = dict(render_dim=128, max_grid_dim=32, self_collision=False)
    else:
        # production physics (STATUS.md round-3 sweep) — match eval_session
        env_cfg = dict(backend="pallas", spring_mode="chebyshev",
                       iterations=16, contact_mode="sort",
                       contact_iterations=4, contact_window=12,
                       contact_every=2, substeps=4, exec_mode="chunked",
                       chunk_steps=192, render_dim=256, max_grid_dim=104)

    B = args.num_tasks * args.cands
    loader = TaskLoader(args.tasks, repeat=True)
    for _ in range(args.task_offset):
        loader.get_next_task()
    base_tasks = [loader.get_next_task() for _ in range(args.num_tasks)]
    # env i of group g runs base_tasks[g]; reloads after a no-move early
    # exit may hand an env a different task, but the post-level broadcast
    # of the group's best state overwrites particles AND topology, so only
    # host-side bookkeeping (memories, timesteps) drifts — unused here.
    serve = {"i": 0}

    def get_task_fn():
        t = base_tasks[(serve["i"] // args.cands) % args.num_tasks]
        serve["i"] += 1
        return t

    env = BatchSimEnv(
        get_task_fn=get_task_fn, replay_buffer_path=None, num_envs=B,
        obs_dim=64, num_rotations=12,
        scale_factors=[1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5, 2.75],
        action_primitives=["fling"], episode_length=args.levels + 5,
        mesh_caps=detect_mesh_caps(args.tasks), domain_randomization=True,
        seed=args.seed, **env_cfg)

    max_cov = np.array(
        [t.get_stats()["max_coverage"] for t in base_tasks], np.float64)
    rng = np.random.default_rng(args.seed)
    t0 = time.time()

    obs = np.asarray(env.reset())
    cov = np.asarray(env._chunked_simple(
        env._vm_coverage, env.state.positions, env.state.active))
    init_ratio = cov.reshape(args.num_tasks, args.cands)[:, 0] / max_cov
    print(f"[oracle] init ratio {np.round(init_ratio, 4).tolist()} "
          f"({time.time() - t0:.0f}s)", flush=True)

    best_ratio = init_ratio.copy()  # oracle@k is a running max
    rows = []
    for level in range(args.levels):
        vm = build_value_maps(obs, args.num_tasks, args.cands, rng)
        env.step(vm)
        cov = np.asarray(env._chunked_simple(
            env._vm_coverage, env.state.positions, env.state.active))
        ratio = cov.reshape(args.num_tasks, args.cands) / max_cov[:, None]
        # a no-move early exit reloads that env with a FRESH crumpled state
        # (batch_env.step reload path) — its coverage is not a fling
        # outcome, so exclude it from the argmax (timesteps resets to 0)
        reloaded = (np.asarray(env.timesteps) == 0).reshape(
            args.num_tasks, args.cands)
        ratio = np.where(reloaded & ~reloaded.all(axis=1, keepdims=True),
                         -1.0, ratio)
        best_of_level = ratio.max(axis=1)
        best_idx = ratio.argmax(axis=1)
        best_ratio = np.maximum(best_ratio, best_of_level)

        # broadcast each group's best state (and topology — reloads may
        # have swapped a slot's task) to the whole group
        sel = (np.arange(args.num_tasks) * args.cands + best_idx)
        idx = jnp.asarray(np.repeat(sel, args.cands))
        env.state = jax.tree_util.tree_map(lambda x: x[idx], env.state)
        env.topo = jax.tree_util.tree_map(lambda x: x[idx], env.topo)
        env._observe()
        obs = np.asarray(env.obs.obs_stack)

        row = {"level": level + 1,
               "oracle_at_k": [round(float(v), 4) for v in best_ratio],
               "level_best": [round(float(v), 4) for v in best_of_level],
               "mean_oracle_at_k": round(float(best_ratio.mean()), 4),
               "seconds": round(time.time() - t0, 1)}
        rows.append(row)
        print(f"[oracle] {json.dumps(row)}", flush=True)

    summary = {
        "tasks": os.path.basename(args.tasks),
        "num_tasks": args.num_tasks, "cands": args.cands,
        "levels": args.levels, "seed": args.seed,
        "task_offset": args.task_offset,
        "init_ratio": [round(float(v), 4) for v in init_ratio],
        "oracle_final": [round(float(v), 4) for v in best_ratio],
        "mean_init": round(float(init_ratio.mean()), 4),
        "mean_oracle": round(float(best_ratio.mean()), 4),
        "min_oracle": round(float(best_ratio.min()), 4),
        "ge_080": int((best_ratio >= 0.80).sum()),
        "seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
