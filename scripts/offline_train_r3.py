"""Offline value-net training on a collected replay buffer.

The reference's optimize step (run_sim.py:16-34) is plain supervised
regression on replay transitions; it runs interleaved with collection only
because collection is the bottleneck.  This runs EXTRA optimize epochs on
the final buffer after collection stops — same loss, same dataset jitter,
same BN semantics — saving numbered checkpoints for the learning curve.

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/offline_train_r3.py \
      --log runs/round3 --steps 400 --save_every 100
"""
import argparse
import os
import pickle

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
# honor JAX_PLATFORMS even under the sitecustomize pre-import (CLAUDE.md)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from flingbot_tpu.learning.dataset import GraspDataset
from flingbot_tpu.learning.nets import MaximumValuePolicy
from flingbot_tpu.learning.train import optimize
from flingbot_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from flingbot_tpu.utils.config import seed_all


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", default="runs/round3")
    p.add_argument("--steps", type=int, default=400,
                   help="optimizer steps (batches) to run")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--save_every", type=int, default=100)
    p.add_argument("--mirror_augment", action="store_true",
                   help="x-flip obs+action augmentation (GraspDataset)")
    p.add_argument("--dihedral_augment", action="store_true",
                   help="full D4 obs+action augmentation (GraspDataset)")
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()
    seed_all(args.seed)

    dataset_path = os.path.join(args.log, "replay_buffer.hdf5")
    # rebuild the policy EXACTLY as the training run did (args.pkl snapshot)
    with open(os.path.join(args.log, "args.pkl"), "rb") as f:
        run_args = pickle.load(f)
    policy = MaximumValuePolicy(**run_args)
    ck = os.path.join(args.log, "latest_ckpt.pth")
    if os.path.exists(ck):
        load_checkpoint(ck, policy)
        print(f"resumed {ck} at step {policy.steps()}", flush=True)

    def dataset_factory(primitive):
        return GraspDataset(
            hdf5_path=dataset_path,
            filter_fn=lambda g: g.attrs.get("action_primitive") == primitive,
            mirror_augment=args.mirror_augment,
            dihedral_augment=args.dihedral_augment,
        )

    done = 0
    while done < args.steps:
        n = min(args.save_every, args.steps - done)
        optimize(policy, dataset_factory, batch_size=args.batch_size,
                 batches_per_update=n)
        done += n
        step = policy.steps()
        save_checkpoint(os.path.join(args.log, f"ckpt_{step:06d}.pth"),
                        policy)
        save_checkpoint(os.path.join(args.log, "latest_ckpt.pth"), policy)
        print(f"[offline] {done}/{args.steps} batches (policy step {step})",
              flush=True)


if __name__ == "__main__":
    main()
