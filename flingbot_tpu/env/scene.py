"""Scene construction: task config -> (topology, ClothState).

Replaces the C++ scene path of the reference — pyflex.set_scene packing a
19-float param vector (environment/flex_utils.py:320-355) into
SoftgymCloth::Initialize (PyFlex/bindings/softgym_scenes/softgym_cloth.h:
33-175) which rebuilds the solver.  Here a scene is just arrays: building
one allocates no solver, and restoring a saved state is a pytree replace.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Union

import jax.numpy as jnp
import numpy as np

from flingbot_tpu.engine.state import ClothState, MAX_GRID_DIM
from flingbot_tpu.engine.topology import (
    GridTopology,
    LayeredGridTopology,
    LayeredSpec,
    MeshTopology,
    build_grid_topology,
    build_layered_topology,
    build_mesh_topology,
    grid_positions,
)

DEFAULT_CAPACITY = MAX_GRID_DIM * MAX_GRID_DIM

# padded capacities for mesh (shirt) cloths — one static bucket so all mesh
# tasks share a compiled program.  These are the FALLBACK ceilings;
# detect_mesh_caps sizes the bucket to the task file's measured maxima
# (the procedural shirt sets run ~3.2k verts / 19k edges / 6.2k tris —
# padding to the old 8k/64k/16k ceilings wasted 2-3.5x solver work).
MESH_VERT_CAPACITY = 8192
MESH_EDGE_CAPACITY = 65536
MESH_TRI_CAPACITY = 16384
# static incidence-table width (vertex-centric spring solve); measured max
# degree over the shirt sets is 18 (stretch+shear+bend + sewing seams)
MESH_DEGREE_CAPACITY = 24


@dataclasses.dataclass
class Scene:
    """A constructed scene: topology + initial state + source config."""

    topo: Union[GridTopology, MeshTopology, LayeredGridTopology]
    state: ClothState
    config: Dict[str, Any]

    @property
    def is_grid(self) -> bool:
        return isinstance(self.topo, GridTopology)


def make_scene(
    config: Dict[str, Any],
    capacity: "int | None" = None,
    max_grid_dim: int = MAX_GRID_DIM,
    mesh_caps: "tuple[int, int, int] | None" = None,
    layered_spec: "LayeredSpec | None" = None,
) -> Scene:
    """Build topology + fresh state from a reference-style config dict
    (keys as produced by Task.get_config / flex_utils.get_default_config).

    Grid cloths spawn at lower = (x, -y, z) of cloth_pos — the same odd sign
    flip SoftgymCloth applies (softgym_cloth.h:76) — but callers always
    overwrite positions via set_state or flattening, exactly like the
    reference flow."""
    mesh_verts = np.asarray(config.get("mesh_verts", ()), np.float32).reshape(-1)
    cloth_mass = float(config.get("cloth_mass", 0.5))
    stiffness = np.asarray(config.get("cloth_stiff", (0.8, 1.0, 0.9)), np.float32)
    # reference order is (stretch, bend, shear) (flex_utils.py:281)
    stiff3 = (float(stiffness[0]), float(stiffness[1]), float(stiffness[2]))

    if mesh_verts.size > 0 and layered_spec is not None:
        # layered-lattice shirt fast path (grid-speed stencil solve; see
        # LayeredGridTopology) — the spec comes from tasks.detect_layered_spec
        # over the task FILE, so every task in a batch shares the bucket
        verts = mesh_verts.reshape(-1, 3).astype(np.float32)
        n = verts.shape[0]
        topo = build_layered_topology(
            verts,
            np.asarray(config["mesh_stretch_edges"], np.int64).reshape(-1, 2),
            np.asarray(config["mesh_bend_edges"], np.int64).reshape(-1, 2),
            np.asarray(config["mesh_shear_edges"], np.int64).reshape(-1, 2),
            np.asarray(config["mesh_faces"], np.int64).reshape(-1, 3),
            stiffness=stiff3,
            spec=layered_spec,
        )
        slot = np.asarray(topo.mesh_slot)[:n]
        cloth_pos = np.asarray(config.get("cloth_pos", (0, 0, 0)), np.float32)
        hw = layered_spec.H * layered_spec.W
        pos = np.zeros((hw, 3), np.float32)
        pos[slot] = verts + np.array(
            [cloth_pos[0], -cloth_pos[1], cloth_pos[2]], np.float32)
        inv = np.zeros(hw, np.float32)
        inv[slot] = n / cloth_mass
        state = ClothState.create(pos, inv, capacity=hw)
        state = state.replace(active=topo.active.reshape(-1))
        return Scene(topo=topo, state=state, config=dict(config))

    if mesh_verts.size > 0:
        vcap, ecap, tcap = mesh_caps or (
            MESH_VERT_CAPACITY, MESH_EDGE_CAPACITY, MESH_TRI_CAPACITY)
        verts = mesh_verts.reshape(-1, 3)
        n = verts.shape[0]
        topo = build_mesh_topology(
            verts,
            np.asarray(config["mesh_stretch_edges"], np.int64).reshape(-1, 2),
            np.asarray(config["mesh_bend_edges"], np.int64).reshape(-1, 2),
            np.asarray(config["mesh_shear_edges"], np.int64).reshape(-1, 2),
            np.asarray(config["mesh_faces"], np.int64).reshape(-1, 3),
            stiffness=stiff3,
            capacity=vcap,
            edge_capacity=ecap,
            tri_capacity=tcap,
            degree_capacity=MESH_DEGREE_CAPACITY,
        )
        inv_mass = np.full(n, n / cloth_mass, np.float32)
        pos = verts.copy()
        cloth_pos = np.asarray(config.get("cloth_pos", (0, 0, 0)), np.float32)
        pos += np.array([cloth_pos[0], -cloth_pos[1], cloth_pos[2]], np.float32)
        state = ClothState.create(pos, inv_mass, capacity=vcap)
    else:
        dimx, dimy = (int(v) for v in config["cloth_size"])
        topo = build_grid_topology(
            dimx, dimy, stiffness=stiff3,
            max_dimx=max_grid_dim, max_dimy=max_grid_dim,
        )
        n = dimx * dimy
        cloth_pos = np.asarray(config.get("cloth_pos", (0, 0, 0)), np.float32)
        pos = grid_positions(
            dimx, dimy,
            lower=(float(cloth_pos[0]), -float(cloth_pos[1]), float(cloth_pos[2])),
        )
        inv_mass = np.full(n, n / cloth_mass, np.float32)
        state = ClothState.create(
            pos, inv_mass, capacity=capacity or max_grid_dim * max_grid_dim)
    return Scene(topo=topo, state=state, config=dict(config))


def apply_state(scene: Scene, state_dict: Dict[str, Any]) -> Scene:
    """Restore a saved particle state onto a scene — set_state parity
    (flex_utils.py:304-310): particle_pos (N*4 flat with invMass in w),
    particle_vel (N*3 flat), shape_pos ((S,14) picker shape states)."""
    st = scene.state
    n_total = st.num_particles
    pp = np.asarray(state_dict["particle_pos"], np.float32).reshape(-1, 4)
    n = pp.shape[0]
    pos = np.array(st.positions)
    im = np.array(st.inv_mass)
    vel = np.array(st.velocities)
    pv = np.asarray(state_dict["particle_vel"], np.float32).reshape(-1, 3)
    if isinstance(scene.topo, LayeredGridTopology):
        # saved states are in MESH vertex order (the task-file contract,
        # tasks.py:267-284) — scatter through the lattice mapping
        slot = np.asarray(scene.topo.mesh_slot)[:n]
        pos[slot] = pp[:, :3]
        im[slot] = pp[:, 3]
        vel[slot[: pv.shape[0]]] = pv
    else:
        pos[:n] = pp[:, :3]
        im[:n] = pp[:, 3]
        vel[: pv.shape[0]] = pv

    picker_pos = np.array(st.picker_pos)
    shape_pos = np.asarray(state_dict.get("shape_pos", ()), np.float32).reshape(-1)
    if shape_pos.size:
        sp = shape_pos.reshape(-1, 14)
        k = min(sp.shape[0], picker_pos.shape[0])
        picker_pos[:k] = sp[:k, :3]

    new_state = st.replace(
        positions=jnp.asarray(pos),
        velocities=jnp.asarray(vel),
        inv_mass=jnp.asarray(im),
        rest_inv_mass=jnp.asarray(im),
        picker_pos=jnp.asarray(picker_pos),
    )
    return dataclasses.replace(scene, state=new_state)


def set_scene(
    config: Dict[str, Any],
    state: Optional[Dict[str, Any]] = None,
    capacity: "int | None" = None,
    max_grid_dim: int = MAX_GRID_DIM,
    mesh_caps: "tuple[int, int, int] | None" = None,
    layered_spec: "LayeredSpec | None" = None,
) -> Scene:
    """set_scene parity (flex_utils.py:320-355): build + optionally restore."""
    scene = make_scene(config, capacity=capacity, max_grid_dim=max_grid_dim,
                       mesh_caps=mesh_caps, layered_spec=layered_spec)
    if state is not None:
        scene = apply_state(scene, state)
    return scene


def flatten_positions(scene: Scene) -> np.ndarray:
    """Flat rest layout centered at the origin at one particle-radius height
    — set_to_flatten parity (flex_utils.py:398-415)."""
    assert scene.is_grid
    dimx = int(scene.topo.dimx)
    dimy = int(scene.topo.dimy)
    # the reference lays flat cloth with linspace over dim*radius
    px = np.linspace(0, dimx * 0.00625, dimx)
    pz = np.linspace(0, dimy * 0.00625, dimy)
    zz, xx = np.meshgrid(pz, px, indexing="ij")
    pos = np.stack([xx, np.full_like(xx, 0.00625), zz], axis=-1).reshape(-1, 3)
    pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0, keepdims=True)
    return pos.astype(np.float32)
