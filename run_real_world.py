"""Real-world training/finetuning driver (reference run_real_world.py:18-94):
the same train loop as run_sim.py against a single synchronous
RealWorldEnv, logging a datapoints/hour rate."""

from __future__ import annotations

import os
import pickle
import time

import numpy as np

from flingbot_tpu.learning.dataset import GraspDataset
from flingbot_tpu.learning.nets import MaximumValuePolicy
from flingbot_tpu.learning.train import optimize
from flingbot_tpu.real_world import (
    RG2,
    WSG50,
    KinectClient,
    RealSense,
    RealWorldEnv,
    UR5,
    UR5Pair,
)
from flingbot_tpu.real_world import setup as rw
from flingbot_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from flingbot_tpu.utils.config import config_parser, seed_all
from flingbot_tpu.utils.stats import get_dataset_size


def build_env(args, dataset_path):
    left = UR5(rw.LEFT_UR5_IP)
    right = UR5(rw.RIGHT_UR5_IP)
    pair = UR5Pair(left, right)
    grippers = (WSG50(rw.WSG50_IP, rw.WSG50_PORT), RG2(right))
    top = KinectClient(rw.KINECT_RPC_URL)
    front = RealSense(rw.REALSENSE_IP, rw.REALSENSE_PORT)
    calib = np.load(args.calibration)
    return RealWorldEnv(
        replay_buffer_path=dataset_path,
        top_camera=top,
        front_camera=front,
        ur5_pair=pair,
        grippers=grippers,
        cam_intrinsics=calib["intrinsics"],
        cam_extrinsics=calib["cam_to_world"],
        **vars(args),
    )


def main():
    parser = config_parser()
    parser.add_argument("--calibration", default="calibration.npz")
    parser.add_argument("--cloth_name", default="white_rect")
    args = parser.parse_args()
    seed_all(args.seed)
    os.makedirs(args.log, exist_ok=True)
    policy = MaximumValuePolicy(**vars(args))
    if args.load:
        load_checkpoint(args.load, policy)
    dataset_path = f"{args.log}/replay_buffer.hdf5"
    pickle.dump(vars(args), open(args.log + "/args.pkl", "wb"))
    env = build_env(args, dataset_path)

    obs = env.reset()
    start = time.time()
    i = 0
    while True:
        vms = policy.value_maps(np.asarray(obs))
        obs = env.step(vms)
        i += 1
        rate = i / max(time.time() - start, 1) * 3600
        print(f"[run_real_world] {i} steps, {rate:.1f} datapoints/hour")
        size = get_dataset_size(dataset_path)
        if not args.eval and size > args.warmup:
            optimize(
                policy,
                lambda prim: GraspDataset(
                    hdf5_path=dataset_path,
                    filter_fn=lambda g:
                    g.attrs.get("action_primitive") == prim,
                    **vars(args)),
                batch_size=args.batch_size,
            )
            save_checkpoint(f"{args.log}/latest_ckpt.pth", policy)


if __name__ == "__main__":
    main()
