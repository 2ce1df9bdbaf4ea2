"""One-process eval session: many (task set, policy) evals under a SINGLE
TPU grant.

Separate eval_quality.py processes need >= 150 s single-client handoff gaps
between them (STATUS.md round-3 lesson); with 8+ evals that's 20+ minutes
of dead chip time.  This driver keeps one jax client alive and runs the
jobs back to back — same programs, same compile cache, no handoffs.

Jobs run in priority order (hard-set policy-vs-heuristic first, then the
first shirt coverage@3, then easy/large, then learning-curve checkpoints)
and each result is appended to --out as one JSON line immediately, so a
mid-session worker fault loses only the running job.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_session_r3.py \
    --ckpt runs/round3/ckpt_000648.pth --budget 3000 \
    --out runs/round3/eval_session.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time
import traceback

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from eval_quality import heuristic_value_maps  # noqa: E402

# production physics config (STATUS.md round-3 sweep: 2,137 env-steps/s AND
# better fling QA than the FleX-parity 30/8/16) + the reference's
# 96-transform action grid (12 rotations x 8 scales) the ckpts trained with
CFG = dict(backend="pallas", spring_mode="chebyshev", iterations=16,
           contact_mode="sort", contact_iterations=4, contact_window=12,
           contact_every=2, substeps=4, exec_mode="chunked", chunk_steps=192)
ROTATIONS = 12
SCALES = (1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5, 2.75)

_policies: dict = {}


def get_policy(load: str, tta: bool = False):
    key = (load, tta)
    if key not in _policies:
        from flingbot_tpu.learning.nets import MaximumValuePolicy
        from flingbot_tpu.utils.checkpoint import load_checkpoint

        policy = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=ROTATIONS,
            scale_factors=list(SCALES), obs_dim=64, tta=tta)
        load_checkpoint(load, policy)
        _policies[key] = policy
    return _policies[key]


def run_eval(name: str, tasks: str, policy: str, load: str | None,
             episodes: int, num_envs: int = 16, max_grid_dim: int = 104,
             steps: int = 3, seed: int = 0, task_offset: int = 0,
             solver_overrides: "dict | None" = None,
             tta: bool = False, surface_render: bool = True) -> dict:
    from flingbot_tpu.env.batch_env import BatchSimEnv
    from flingbot_tpu.env.tasks import TaskLoader, detect_topology_buckets
    from flingbot_tpu.utils.stats import collect_stats

    replay = tempfile.mktemp(suffix=".hdf5")
    loader = TaskLoader(tasks, repeat=True)
    for _ in range(task_offset):  # small-n shirt rows: skip served tasks
        loader.get_next_task()
    # shirt sets: the layered stencil path (grid speed) when the garments
    # are lattice meshes, else the generic mesh gather path
    env = BatchSimEnv(
        get_task_fn=loader.get_next_task, replay_buffer_path=replay,
        num_envs=num_envs, obs_dim=64, num_rotations=ROTATIONS,
        scale_factors=list(SCALES), action_primitives=["fling"],
        episode_length=steps, render_dim=256, max_grid_dim=max_grid_dim,
        **detect_topology_buckets(tasks), domain_randomization=True,
        seed=seed, solver_overrides=solver_overrides,
        surface_render=surface_render, **CFG)
    net = get_policy(load, tta) if policy == "ckpt" else None

    t0 = time.time()
    obs = env.reset()
    while env.episodes_done < episodes:
        if policy == "heuristic":
            vm = heuristic_value_maps(np.asarray(obs))
        else:
            vm = np.asarray(net.batch_value_maps(obs))
        obs = env.step(vm)
        print(f"[{name}] episodes {env.episodes_done}/{episodes} "
              f"({time.time() - t0:.0f}s)", flush=True)

    stats = collect_stats(replay, num_points=10 ** 9) or {}
    out = {"job": name, "tasks": os.path.basename(tasks), "policy": policy,
           "load": load, "episodes": env.episodes_done, "seed": seed,
           "seconds": round(time.time() - t0, 1)}
    if solver_overrides:
        out["solver_overrides"] = solver_overrides
    for k, v in sorted(stats.items()):
        if any(k.startswith(p) and k.endswith(s)
               for p in ("final_coverage/", "init_coverage/",
                         "episode_delta_coverage/", "best_coverage/")
               for s in ("/mean", "/max")) or k.endswith("percent_positive"):
            out[k] = round(float(v), 4)
        # raw per-episode values so eval_table can compute bootstrap CIs
        elif any(k.startswith(p) for p in
                 ("init_coverage/", "episode_delta_coverage/",
                  "best_coverage/")) and k.endswith("/distribution"):
            out[k] = [round(float(x), 4) for x in np.asarray(v).ravel()]
    try:
        os.unlink(replay)
    except OSError:
        pass
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="runs/round3/ckpt_000648.pth")
    p.add_argument("--out", default="runs/round3/eval_session.jsonl")
    p.add_argument("--budget", type=float, default=3000.0,
                   help="stop starting new jobs after this many seconds")
    p.add_argument("--skip", type=int, default=0,
                   help="skip the first N jobs (resume after a fault)")
    p.add_argument("--only", default=None,
                   help="comma-separated job-name substrings; run (in the "
                        "given order) only jobs matching one of them")
    p.add_argument("--curve", default=None,
                   help="comma-separated extra ckpt paths to add as "
                        "hard-set learning-curve jobs")
    p.add_argument("--num_envs_override", type=int, default=None,
                   help="force every job's env batch width (fault triage)")
    p.add_argument("--no_surface_render", action="store_true",
                   help="particle-splat renderer fallback (fault triage)")
    args = p.parse_args()

    hard = "data_r3/rect_eval_hard_100.hdf5"
    easy = "data_r3/rect_eval_easy_64.hdf5"
    large = "data_r3/rect_eval_large_64.hdf5"
    shirt = "data_r3/shirt_eval_16.hdf5"
    ck = args.ckpt
    run = os.path.dirname(ck)

    # FULL sets with matched episode counts per policy (VERDICT r3 item 3:
    # "full task sets, identical episode counts, seeds recorded").
    # num_envs divides the episode count exactly, so every task is
    # evaluated exactly once per job (the repeat loader assigns tasks
    # sequentially; a non-divisor width would re-run the first tasks).
    jobs = [
        # the held-out policy-vs-heuristic comparison
        dict(name="hard/heuristic", tasks=hard, policy="heuristic",
             load=None, episodes=100, num_envs=20),
        dict(name="hard/ckpt", tasks=hard, policy="ckpt", load=ck,
             episodes=100, num_envs=20),
        # shirt coverage@3
        dict(name="shirt/heuristic", tasks=shirt, policy="heuristic",
             load=None, episodes=16),
        dict(name="shirt/ckpt", tasks=shirt, policy="ckpt", load=ck,
             episodes=16),
        # capability preview under the round-5 fling-knob sweep winner
        # (dynamic_friction 0.25: level-1 oracle 0.703 vs 0.598 base) —
        # heuristic needs no retraining, so this is the first held-out
        # best-cov@3 number under the improved physics
        dict(name="hard/heuristic-fric25", tasks=hard, policy="heuristic",
             load=None, episodes=100, num_envs=20,
             solver_overrides={"dynamic_friction": 0.25}),
        # round-5 friction refinement winner (fric.1: level-1 oracle 0.838,
        # 5/8 tasks >= 0.80; strain check shows no fabric stretch) — the
        # headline capability pair under the new physics
        dict(name="hard/heuristic-fric1", tasks=hard, policy="heuristic",
             load=None, episodes=100, num_envs=20,
             solver_overrides={"dynamic_friction": 0.1}),
        dict(name="hard/ckpt-fric1", tasks=hard, policy="ckpt", load=ck,
             episodes=100, num_envs=20,
             solver_overrides={"dynamic_friction": 0.1}),
        # dihedral test-time-averaged value maps (beyond-reference
        # inference feature; 8x CNN cost is negligible next to the sim)
        dict(name="hard/ckpt-tta", tasks=hard, policy="ckpt", load=ck,
             episodes=100, num_envs=20, tta=True),
        dict(name="easy/ckpt-tta", tasks=easy, policy="ckpt", load=ck,
             episodes=64, tta=True),
        # remaining sets
        dict(name="easy/heuristic", tasks=easy, policy="heuristic",
             load=None, episodes=64),
        dict(name="easy/ckpt", tasks=easy, policy="ckpt", load=ck,
             episodes=64),
        dict(name="large/heuristic", tasks=large, policy="heuristic",
             load=None, episodes=64, max_grid_dim=128),
        dict(name="large/ckpt", tasks=large, policy="ckpt", load=ck,
             episodes=64, max_grid_dim=128),
        # learning-curve points on the hard set (same program: free
        # compiles).  ckpt026 ~= untrained; 648 = round-3 final; round-4
        # ckpts land in runs/round4 and are added via --curve globs.
        dict(name="hard/ckpt026", tasks=hard, policy="ckpt",
             load="runs/round3/ckpt_000026.pth", episodes=100, num_envs=20),
        dict(name="hard/ckpt648", tasks=hard, policy="ckpt",
             load="runs/round3/ckpt_000648.pth", episodes=100, num_envs=20),
    ]
    for extra in (args.curve.split(",") if args.curve else []):
        extra = extra.strip()
        if not extra:
            continue
        step_tag = os.path.basename(extra).split("ckpt_")[-1].split(".")[0]
        jobs.append(dict(
            name=f"hard/ckpt{int(step_tag)}", tasks=hard, policy="ckpt",
            load=extra, episodes=100, num_envs=20))

    if args.only:
        pats = [s.strip() for s in args.only.split(",") if s.strip()]
        # ordered by the --only list, not the default priority order;
        # dedupe overlapping patterns and fail loudly on a typo'd pattern
        # (ADVICE round 3: duplicates burned TPU budget, no-match was silent)
        picked, seen = [], set()
        for pat in pats:
            # exact name wins; substring match only as a fallback (the
            # pattern "hard/ckpt" must NOT also pull in hard/ckpt026/648)
            matched = [j for j in jobs if pat == j["name"]] \
                or [j for j in jobs if pat in j["name"]]
            if not matched:
                raise SystemExit(
                    f"--only pattern {pat!r} matched no job name")
            for j in matched:
                if j["name"] not in seen:
                    seen.add(j["name"])
                    picked.append(j)
        jobs = picked

    # resume: skip jobs that already have a row in --out (so a retry
    # wrapper after a worker fault re-runs only what's missing)
    done_names = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for line in f:
                try:
                    done_names.add(json.loads(line).get("job"))
                except Exception:
                    pass

    t0 = time.time()
    for i, job in enumerate(jobs):
        if args.num_envs_override:
            job["num_envs"] = args.num_envs_override
        if args.no_surface_render:
            job["surface_render"] = False
        if i < args.skip:
            continue
        if job["name"] in done_names:
            print(f"[session] skipping {job['name']} (row exists in "
                  f"{args.out})", flush=True)
            continue
        if time.time() - t0 > args.budget:
            print(f"[session] budget exhausted before {job['name']}",
                  flush=True)
            break
        print(f"=== job {i}: {job['name']} ({time.time() - t0:.0f}s in)",
              flush=True)
        try:
            res = run_eval(**job)
        except Exception:
            # a fault here usually means the worker wedged — STOP rather
            # than hammer the chip.  Exit nonzero so a retry wrapper
            # (with its own cooldown) can resume; completed jobs are
            # skipped via their rows in --out.
            traceback.print_exc()
            print(f"[session] job {i} ({job['name']}) FAILED — stopping",
                  flush=True)
            raise SystemExit(17)
        with open(args.out, "a") as f:
            f.write(json.dumps(res) + "\n")
        print(json.dumps(res), flush=True)
    print(f"[session] done ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
