"""flingbot_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of FlingBot.

A brand-new framework with the capabilities of real-stanford/flingbot:
learning to unfold cloth with a dual-arm pick -> stretch -> fling primitive,
trained self-supervised in a particle cloth simulator.

Where the reference stacks Python on a closed-source NVIDIA FleX CUDA binary
(reference: PyFlex/include/NvFlex.h) orchestrated by a Ray actor pool of
single-GPU processes (reference: utils.py:144-157), this package keeps the
entire inner loop — XPBD cloth physics, RGB-D rendering, value-map CNN
inference, and action selection — on the TPU as one jitted, vmapped program:

- ``flingbot_tpu.engine``   XPBD cloth solver (stencil kernels for grid
  cloth, gather kernels for arbitrary meshes), replaces the NvFlex binary.
- ``flingbot_tpu.render``   on-device top-down RGB-D rasterizer, replaces
  the OpenGL/EGL renderer (PyFlex/bindings/opengl) and Blender subprocess.
- ``flingbot_tpu.env``      the simulation environment: tasks, primitives,
  coverage reward; API-compatible with environment/simEnv.py.
- ``flingbot_tpu.learning`` Flax spatial action-value networks, policy,
  replay memory (HDF5 schema compatible with learning/Memory.py).
- ``flingbot_tpu.parallel`` device-mesh sharding of envs + data-parallel
  training via shard_map, replaces the Ray env pool.
"""

__version__ = "0.1.0"

from flingbot_tpu.engine.state import ClothState, SolverParams, SceneConfig
from flingbot_tpu.engine.topology import (
    build_grid_topology,
    build_mesh_topology,
    load_cloth,
)

__all__ = [
    "ClothState",
    "SolverParams",
    "SceneConfig",
    "build_grid_topology",
    "build_mesh_topology",
    "load_cloth",
]
