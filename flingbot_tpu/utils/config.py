"""Flag system — the same ~30 training/eval/env flags as the reference
config_parser (reference: utils.py:17-88), plus TPU-native additions
(num_envs, spring_mode, self_collision, mesh axis size).

Boolean flags that default to True use BooleanOptionalAction so they can
actually be turned off from the CLI (--no_obs_color_jitter etc.) — the
reference's store_true-with-default-True pattern made them unfalsifiable.
"""

from __future__ import annotations

import random
from argparse import ArgumentParser, BooleanOptionalAction

import numpy as np


def config_parser(parser: ArgumentParser = None) -> ArgumentParser:
    if parser is None:
        parser = ArgumentParser("Dynamic Cloth Manipulation (TPU)")
    parser.add_argument("--log", type=str, default="runs/default")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--load", type=str, default=None,
                        help="path of policy checkpoint to load")
    parser.add_argument("--num_envs", type=int, default=16,
                        help="vmapped envs per step (replaces num_processes)")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="alias of --num_envs (reference flag name)")
    parser.add_argument("--tasks", type=str, default="tasks.hdf5",
                        help="path to task HDF5 dataset")
    parser.add_argument("--eval", action="store_true", default=False)
    parser.add_argument("--dump_visualizations", action="store_true",
                        default=False)

    # Optimization
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--weight_decay", type=float, default=1e-6)
    # Algorithm
    parser.add_argument("--batches_per_update", type=int, default=1)
    parser.add_argument("--update_frequency", type=int, default=1)
    parser.add_argument("--warmup", type=int, default=128)
    parser.add_argument("--save_ckpt", type=int, default=512)
    parser.add_argument("--dataset_path", type=str, default=None)
    parser.add_argument("--action_expl_prob", type=float, default=0.0)
    parser.add_argument("--action_expl_decay", type=float, default=0.9995)
    parser.add_argument("--value_expl_prob", type=float, default=0.0)
    parser.add_argument("--value_expl_decay", type=float, default=0.995)
    parser.add_argument("--obs_color_jitter", action=BooleanOptionalAction,
                        default=True)
    parser.add_argument("--mirror_augment", action=BooleanOptionalAction,
                        default=False,
                        help="x-flip obs+action replay augmentation "
                             "(physics-sound, beyond-reference; see "
                             "GraspDataset)")
    parser.add_argument("--dihedral_augment", action=BooleanOptionalAction,
                        default=False,
                        help="full D4 obs+action replay augmentation "
                             "(4 rotations x flip = 8 views; supersedes "
                             "--mirror_augment; see GraspDataset)")
    parser.add_argument("--tta", action=BooleanOptionalAction, default=False,
                        help="dihedral test-time averaging of value maps "
                             "(nets.value_map_inference_tta)")
    parser.add_argument("--domain_randomization",
                        action=BooleanOptionalAction, default=True,
                        help="per-episode randomized floor texture + cloth "
                             "color in the renderer (reference: "
                             "render_rgbd.py:10-54)")
    parser.add_argument("--fixed_fling_height", type=float, default=-1)
    parser.add_argument("--fling_speed", type=float, default=6e-3,
                        help="picker speed during the fast fling strokes, "
                             "m/sim-step (simEnv.py:55); a fling-knob sweep "
                             "axis (scripts/fling_knob_sweep.py)")
    # Network
    parser.add_argument("--depth_only", action="store_true", default=False)
    parser.add_argument("--rgb_only", action=BooleanOptionalAction,
                        default=True)
    parser.add_argument("--use_adaptive_scaling",
                        action=BooleanOptionalAction, default=True)
    parser.add_argument("--use_normalized_coverage",
                        action=BooleanOptionalAction, default=True)
    parser.add_argument("--conservative_grasp_radius", type=int, default=1)
    parser.add_argument("--action_primitives", nargs="+",
                        choices=["fling", "stretchdrag", "drag", "place"],
                        default=["fling"])
    parser.add_argument("--obs_dim", type=int, default=64)
    parser.add_argument("--pix_grasp_dist", type=int, default=8)
    parser.add_argument("--pix_drag_dist", type=int, default=10)
    parser.add_argument("--pix_place_dist", type=int, default=10)
    parser.add_argument("--stretchdrag_dist", type=float, default=0.3)
    parser.add_argument("--reach_distance_limit", type=float, default=1.2)
    parser.add_argument("--num_rotations", type=int, default=12)
    parser.add_argument("--scale_factors", nargs="+", type=float,
                        default=[1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5, 2.75])
    parser.add_argument("--render_dim", type=int, default=400)
    parser.add_argument("--episode_length", type=int, default=10)
    # TPU-native physics/runtime knobs.  Defaults are the QA'd PRODUCTION
    # config (round-3 sweep, scripts/perf_sweep_r3.py: 2,137 env-steps/s/chip
    # at 512 envs AND better fling QA than the FleX-parity 4x30 — 0.539 vs
    # 0.511 heuristic best-coverage@3, lower hang-stretch).  Every number
    # measured in rounds 2-4 (bench, eval sessions, training) ran this
    # config; `--flex_parity` restores the reference's solver operating
    # point (softgym_cloth.h:154-155) for physics-parity comparisons.
    parser.add_argument("--spring_mode",
                        choices=["gs", "jacobi", "chebyshev"],
                        default="chebyshev")
    parser.add_argument("--backend", choices=["xla", "pallas"],
                        default="pallas")
    parser.add_argument("--substeps", type=int, default=4)
    parser.add_argument("--iterations", type=int, default=16)
    parser.add_argument("--contact_mode",
                        choices=["sort", "sweep", "block", "table"],
                        default="sort",
                        help="self-collision strategy on the XLA backend "
                             "(the pallas backend always uses the sorted-"
                             "window kernel)")
    parser.add_argument("--contact_every", type=int, default=2)
    parser.add_argument("--contact_iterations", type=int, default=4)
    parser.add_argument("--contact_window", type=int, default=12)
    parser.add_argument("--flex_parity", action="store_true", default=False,
                        help="preset: the reference FleX solver operating "
                             "point (gs springs, 4 substeps x 30 iterations, "
                             "contacts 8/16/every substep, raw scene "
                             "friction 0.75 — softgym_cloth.h:154-164); "
                             "overrides the production solver knobs")
    parser.add_argument("--solver_overrides", type=str, default=None,
                        help="JSON dict of SolverParams leaf overrides, "
                             'e.g. \'{"damping": 0.0, "lift": 0.05}\' — '
                             "runtime values (no recompile), the hook the "
                             "fling-knob sweep winners are trained/evaled "
                             "under (scripts/fling_knob_sweep.py)")
    parser.add_argument("--no_self_collision", action="store_true",
                        default=False)
    parser.add_argument("--max_grid_dim", type=int, default=104)
    parser.add_argument("--env_chunk", type=int, default=None,
                        help="envs per device program call (default: all "
                             "envs when exec_mode=chunked, 32 when fused)")
    parser.add_argument("--obs_chunk", type=int, default=None,
                        help="envs per observation (96-view warp) device "
                             "call; the obs stack is the HBM hog, so it is "
                             "capped separately from env_chunk (default 64)")
    parser.add_argument("--exec_mode", choices=["chunked", "fused"],
                        default="chunked",
                        help="chunked: host-driven bounded device calls "
                             "(safe at any batch size); fused: one "
                             "while_loop program per env step")
    parser.add_argument("--chunk_loop", choices=["while", "scan"],
                        default="while",
                        help="device loop structure inside each program "
                             "chunk (scan = static trip count; see "
                             "primitives.program_chunk)")
    parser.add_argument("--chunk_steps", type=int, default=192,
                        help="max sim steps per device call in chunked mode "
                             "(192 at 128 envs ~= 11 s/call on v5e — inside "
                             "the TPU per-call wall-time limit; BatchSimEnv "
                             "clamps mesh topologies harder)")
    parser.add_argument("--dp_devices", type=int, default=None,
                        help="devices on the dp mesh axis (default: all)")
    return parser


def apply_presets(args):
    """Post-parse preset expansion (call right after parse_args)."""
    if getattr(args, "flex_parity", False):
        args.spring_mode = "gs"
        args.iterations = 30
        args.contact_every = 1
        args.contact_iterations = 8
        args.contact_window = 16
        # raw FleX scene friction constant (softgym_cloth.h:164); the
        # production default is the behaviorally calibrated mu — see
        # engine/state.py SolverParams.dynamic_friction
        import json as _json
        from flingbot_tpu.engine.state import FLEX_SCENE_FRICTION
        ov = _json.loads(getattr(args, "solver_overrides", None) or "{}")
        ov.setdefault("dynamic_friction", FLEX_SCENE_FRICTION)
        args.solver_overrides = _json.dumps(ov)
    if getattr(args, "num_processes", None):
        args.num_envs = args.num_processes
    return args


def seed_all(seed: int):
    print(f"SEEDING WITH {seed}")
    random.seed(seed)
    np.random.seed(seed)
