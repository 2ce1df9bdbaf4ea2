"""Quality evaluation: coverage after K flings on a task set.

The reference's headline capability number is >80% coverage within 3 fling
actions with a trained policy (reference README.md:21,29).  This harness
measures coverage@K for:
  - a loaded checkpoint (--load ckpt.pth)
  - the 'heuristic' policy: value peaks at cloth pixels far from the cloth
    centroid (grasp the far edge) — a strong hand-coded baseline
  - 'random' value maps

Usage:
  python eval_quality.py --tasks eval.hdf5 --policy heuristic --steps 3
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# honor JAX_PLATFORMS even though sitecustomize pre-imports jax with the
# axon platform frozen in (CLAUDE.md) — without this, CPU smoke runs of
# the eval CLI silently target the TPU
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def heuristic_value_maps(obs_stack: np.ndarray) -> np.ndarray:
    """(B, T, 4, D, D) obs -> (B, 1, T, D, D) values.

    Cloth pixels score by distance from the cloth centroid (prefer grasping
    the far edge of the cloth); background pixels score -1."""
    depth = obs_stack[:, :, 3]  # (B, T, D, D)
    cloth = depth < 1.995
    B, T, D, _ = depth.shape
    ys = np.arange(D)[None, None, :, None]
    xs = np.arange(D)[None, None, None, :]
    denom = np.maximum(cloth.sum(axis=(2, 3), keepdims=True), 1)
    cy = (cloth * ys).sum(axis=(2, 3), keepdims=True) / denom
    cx = (cloth * xs).sum(axis=(2, 3), keepdims=True) / denom
    dist = np.sqrt((ys - cy) ** 2 + (xs - cx) ** 2) / D
    vm = np.where(cloth, dist, -1.0)
    return vm[:, None].astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", required=True)
    p.add_argument("--policy", default="heuristic",
                   choices=["heuristic", "random", "ckpt"])
    p.add_argument("--load", default=None)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--num_envs", type=int, default=8)
    # pinned to the reference/training 96-transform action grid
    # (12 rotations x 8 scales, utils.py:80-84) so headline numbers are
    # comparable across rounds (VERDICT r4 weak #8)
    p.add_argument("--num_rotations", type=int, default=12)
    p.add_argument("--scale_factors", nargs="+", type=float,
                   default=[1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5, 2.75])
    p.add_argument("--render_dim", type=int, default=256)
    p.add_argument("--max_grid_dim", type=int, default=104)
    p.add_argument("--episodes", type=int, default=None,
                   help="total episodes (default: one pass over the tasks)")
    # defaults = the QA'd production solver config (see utils/config.py)
    p.add_argument("--backend", default="pallas")
    p.add_argument("--spring_mode", default="chebyshev",
                   choices=["gs", "jacobi", "chebyshev"])
    p.add_argument("--contact_mode", default="sort",
                   choices=["block", "sweep", "sort", "table"])
    p.add_argument("--substeps", type=int, default=4)
    p.add_argument("--iterations", type=int, default=16)
    p.add_argument("--contact_every", type=int, default=2)
    p.add_argument("--contact_iterations", type=int, default=4)
    p.add_argument("--contact_window", type=int, default=12)
    p.add_argument("--exec_mode", choices=["chunked", "fused"],
                   default="chunked")
    p.add_argument("--chunk_steps", type=int, default=192)
    from argparse import BooleanOptionalAction
    p.add_argument("--domain_randomization", action=BooleanOptionalAction,
                   default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tta", action=BooleanOptionalAction, default=False,
                   help="dihedral test-time averaging of value maps "
                        "(value_map_inference_tta)")
    p.add_argument("--solver_overrides", type=str, default=None,
                   help="JSON dict of SolverParams leaf overrides")
    args = p.parse_args()

    from flingbot_tpu.env.batch_env import BatchSimEnv
    from flingbot_tpu.env.tasks import TaskLoader, detect_topology_buckets

    import tempfile

    replay = tempfile.mktemp(suffix=".hdf5")
    loader = TaskLoader(args.tasks, repeat=True)
    env = BatchSimEnv(
        get_task_fn=loader.get_next_task,
        replay_buffer_path=replay,
        num_envs=args.num_envs,
        obs_dim=64,
        num_rotations=args.num_rotations,
        scale_factors=args.scale_factors,
        action_primitives=["fling"],
        episode_length=args.steps,
        render_dim=args.render_dim,
        max_grid_dim=args.max_grid_dim,
        **detect_topology_buckets(args.tasks),  # shirt sets run batched too
        backend=args.backend,
        spring_mode=args.spring_mode,
        contact_mode=args.contact_mode,
        substeps=args.substeps,
        iterations=args.iterations,
        contact_every=args.contact_every,
        contact_iterations=args.contact_iterations,
        contact_window=args.contact_window,
        domain_randomization=args.domain_randomization,
        exec_mode=args.exec_mode,
        chunk_steps=args.chunk_steps,
        seed=args.seed,
        solver_overrides=args.solver_overrides,
    )
    policy = None
    if args.policy == "ckpt":
        from flingbot_tpu.learning.nets import MaximumValuePolicy
        from flingbot_tpu.utils.checkpoint import load_checkpoint

        policy = MaximumValuePolicy(
            action_primitives=["fling"],
            num_rotations=args.num_rotations,
            scale_factors=args.scale_factors, obs_dim=64, tta=args.tta)
        load_checkpoint(args.load, policy)

    target = args.episodes or len(loader)
    obs = env.reset()
    rng = np.random.default_rng(0)
    import time

    t0 = time.time()
    while env.episodes_done < target:
        o = np.asarray(obs)
        if args.policy == "heuristic":
            vm = heuristic_value_maps(o)
        elif args.policy == "random":
            vm = rng.uniform(size=(o.shape[0], 1, o.shape[1], 64, 64)
                             ).astype(np.float32)
        else:
            vm = np.asarray(policy.batch_value_maps(obs))
        obs = env.step(vm)
        print(f"[eval] episodes {env.episodes_done}/{target} "
              f"({time.time() - t0:.0f}s)", flush=True)

    from flingbot_tpu.utils.stats import collect_stats

    stats = collect_stats(replay, num_points=10 ** 9) or {}
    out = {"episodes": env.episodes_done,
           "seconds": round(time.time() - t0, 1)}
    for k, v in sorted(stats.items()):
        if any(k.startswith(p) and k.endswith(s)
               for p in ("final_coverage/", "init_coverage/",
                         "episode_delta_coverage/", "best_coverage/")
               for s in ("/mean", "/max")) or k.endswith("percent_positive"):
            out[k] = round(float(v), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
