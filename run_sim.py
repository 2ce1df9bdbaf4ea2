"""Training / evaluation driver — the reference run_sim.py rebuilt for TPU.

Flow parity (reference: run_sim.py:37-109): build policy + optimizer,
spawn environments, then loop {act -> env step -> optimize each primitive's
value net -> checkpoint -> stats}.  The Ray actor pool + async future
harvest (utils.py:144-157, 394-418) is replaced by ONE vmapped BatchSimEnv
stepping every env in lockstep on device.

Usage:
  python run_sim.py --tasks tasks.hdf5 --log runs/exp1 --num_envs 16
  python run_sim.py --tasks eval.hdf5 --load runs/exp1/latest_ckpt.pth --eval
"""

from __future__ import annotations

import os
import pickle

import numpy as np

try:  # persistent compile cache (slow remote compiles on the axon tunnel)
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     os.path.expanduser("~/.flingbot_jaxcache")))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # honor JAX_PLATFORMS even though sitecustomize may have imported jax
    # before us (which freezes the env-var default)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
except Exception:
    pass

from flingbot_tpu.env.batch_env import BatchSimEnv
from flingbot_tpu.env.tasks import TaskLoader
from flingbot_tpu.learning.dataset import GraspDataset
from flingbot_tpu.learning.nets import MaximumValuePolicy
from flingbot_tpu.learning.train import optimize
from flingbot_tpu.utils.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    setup_eval_dir,
)
from flingbot_tpu.utils.config import apply_presets, config_parser, seed_all
from flingbot_tpu.utils.stats import collect_stats, get_dataset_size


def make_writer(logdir):
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(logdir=logdir)
    except Exception:
        class _Null:
            def add_scalar(self, *a, **k):
                pass

            def add_histogram(self, *a, **k):
                pass

            def add_image(self, *a, **k):
                pass

        return _Null()


def setup(args):
    """setup_network parity (utils.py:100-141): build policy, auto-resume,
    derive the replay-buffer path (fresh *_eval_i dir in eval mode)."""
    policy = MaximumValuePolicy(**vars(args))
    checkpoint_path = args.load
    dataset_path = args.dataset_path
    if (args.log and os.path.exists(args.log) and checkpoint_path is None
            and os.path.exists(f"{args.log}/latest_ckpt.pth")):
        checkpoint_path = f"{args.log}/latest_ckpt.pth"
    if checkpoint_path is not None:
        print(f"Loading checkpoint {checkpoint_path}")
        load_checkpoint(checkpoint_path, policy)
        print(f"\tSteps: {policy.steps()}")
    if args.eval:
        assert args.load is not None
        policy.action_expl_prob = 0.0
        policy.value_expl_prob = 0.0
        args.log = setup_eval_dir(args.load)
        dataset_path = args.log + "replay_buffer.hdf5"
        print(f"Evaluating {args.load}: saving to {dataset_path}")
    elif dataset_path is None and args.log is not None:
        dataset_path = f"{args.log}/replay_buffer.hdf5"
        print(f"Replay Buffer path: {dataset_path}")
    return policy, dataset_path


def main():
    args = apply_presets(config_parser().parse_args())
    seed_all(args.seed)
    os.makedirs(args.log, exist_ok=True)
    policy, dataset_path = setup(args)
    writer = make_writer(args.log)
    if not os.path.exists(args.log + "/args.pkl"):
        pickle.dump(vars(args), open(args.log + "/args.pkl", "wb"))

    from flingbot_tpu.env.tasks import detect_topology_buckets

    task_loader = TaskLoader(args.tasks, repeat=not args.eval)
    env = BatchSimEnv(
        get_task_fn=task_loader.get_next_task,
        replay_buffer_path=dataset_path,
        self_collision=not args.no_self_collision,
        **detect_topology_buckets(args.tasks),
        **vars(args),
    )

    # one dataset instance per primitive, incrementally refreshed — a fresh
    # GraspDataset per optimize round re-opens EVERY group to re-apply the
    # filter, an O(dataset) host cost that grows all run
    _ds_cache = {}

    def dataset_factory(primitive):
        ds = _ds_cache.get(primitive)
        if ds is None:
            ds = GraspDataset(
                hdf5_path=dataset_path,
                filter_fn=lambda g:
                    g.attrs.get("action_primitive") == primitive,
                **vars(args),
            )
            _ds_cache[primitive] = ds
        else:
            ds.refresh()
        return ds

    try:
        obs = env.reset()
    except StopIteration:
        print("No tasks available")
        return

    i = get_dataset_size(dataset_path)
    eval_episode_target = len(task_loader) if args.eval else None
    import time as _time
    while True:
        _t0 = _time.perf_counter()
        vm = policy.batch_value_maps(obs)
        _t1 = _time.perf_counter()
        try:
            obs = env.step(vm)
        except StopIteration:
            print("[eval] task set exhausted")
            break
        _t2 = _time.perf_counter()
        dataset_size = get_dataset_size(dataset_path)
        if i > args.warmup:
            policy.decay_exploration()
        if not args.eval and dataset_size > args.warmup \
                and i % args.update_frequency == 0:
            optimize(
                policy, dataset_factory,
                batch_size=args.batch_size,
                batches_per_update=args.batches_per_update,
                writer=writer,
            )
            save_checkpoint(f"{args.log}/latest_ckpt.pth", policy)
            _t3 = _time.perf_counter()
            print(f"[round {i}] act {_t1 - _t0:.1f}s step {_t2 - _t1:.1f}s "
                  f"optimize {_t3 - _t2:.1f}s n={dataset_size}", flush=True)
            if i % args.save_ckpt == 0:
                save_checkpoint(
                    f"{args.log}/ckpt_{policy.steps():06d}.pth", policy)
        if i % 32 == 0 and dataset_size > 0:
            stats = collect_stats(dataset_path) or {}
            print("=" * 18 + f" {dataset_size} points " + "=" * 18)
            for key, value in stats.items():
                if "_steps" in key:
                    continue
                if "distribution" in key:
                    writer.add_histogram(key, value, global_step=dataset_size)
                elif "img" in key:
                    writer.add_image(key, value, global_step=dataset_size)
                elif np.isscalar(value) or getattr(value, "ndim", 1) == 0:
                    writer.add_scalar(key, float(value),
                                      global_step=dataset_size)
                    print(f"\t[{key:<42}]:\t{float(value):.04f}")
        if args.eval and eval_episode_target is not None \
                and env.episodes_done >= eval_episode_target:
            print("[eval] done:", env.episodes_done, "episodes")
            break
        i += 1

    if args.eval:
        stats = collect_stats(dataset_path, num_points=10 ** 9) or {}
        for key, value in stats.items():
            if "_steps" in key or "distribution" in key or "img" in key:
                continue
            print(f"\t[{key:<42}]:\t{float(value):.04f}")


if __name__ == "__main__":
    main()
