from flingbot_tpu.engine.state import ClothState, SolverParams, SceneConfig
from flingbot_tpu.engine.topology import (
    GridTopology,
    LayeredGridTopology,
    MeshTopology,
    build_grid_topology,
    build_mesh_topology,
    load_cloth,
)
from flingbot_tpu.engine.solver import step, substep

__all__ = [
    "ClothState",
    "SolverParams",
    "SceneConfig",
    "GridTopology",
    "LayeredGridTopology",
    "MeshTopology",
    "build_grid_topology",
    "build_mesh_topology",
    "load_cloth",
    "step",
    "substep",
]
