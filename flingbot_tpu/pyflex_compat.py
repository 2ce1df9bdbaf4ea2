"""Drop-in `pyflex`-style module API over the TPU engine.

The reference exposes its simulator as a global-state module
(`import pyflex; pyflex.init(); pyflex.set_scene(...); pyflex.step()`;
reference PyFlex/bindings/pyflex.cpp:1135-1208, one scene per process —
which is why the reference needs a Ray process pool).  This shim offers the
same function surface over one ClothState so code written against pyflex
ports mechanically:

    from flingbot_tpu import pyflex_compat as pyflex
    pyflex.init(True, True, 720, 720)
    pyflex.set_scene(0, scene_params, ...)   # or set_scene_config(config)
    pyflex.step()
    pos = pyflex.get_positions()

Prefer the functional API (flingbot_tpu.engine / env.scene) for new code —
this module exists for migration parity only.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from flingbot_tpu.engine.solver import step as _solver_step
from flingbot_tpu.engine.state import ClothState, SolverParams
from flingbot_tpu.env import scene as _scene_mod
from flingbot_tpu.render.rasterizer import render_rgbd as _render_rgbd


class _Sim:
    scene: Optional[_scene_mod.Scene] = None
    state: Optional[ClothState] = None
    params = SolverParams()
    render_dim = 720
    step_fn = None
    sphere_count = 0
    n_particles = 0


_sim = _Sim()


def init(headless: bool = True, render: bool = True,
         width: int = 720, height: int = 720):
    """pyflex.init parity (pyflex.cpp:15-124) — no GL/EGL context needed."""
    _sim.render_dim = width


def set_scene(scene_idx=0, scene_params=None, vertices=(), stretch_edges=(),
              bend_edges=(), shear_edges=(), faces=(), thread_idx=0):
    """pyflex.set_scene parity: unpack the 19-float param vector
    (flex_utils.py:332-342 packing order) + mesh arrays."""
    p = np.asarray(scene_params, np.float64).reshape(-1)
    config = {
        "cloth_pos": p[0:3],
        "cloth_size": [int(p[3]), int(p[4])],
        "cloth_stiff": p[5:8],
        "cloth_mass": float(p[17]) if len(p) > 17 else 0.5,
        "flip_mesh": int(p[18]) if len(p) > 18 else 0,
        "mesh_verts": np.asarray(vertices),
        "mesh_stretch_edges": np.asarray(stretch_edges),
        "mesh_bend_edges": np.asarray(bend_edges),
        "mesh_shear_edges": np.asarray(shear_edges),
        "mesh_faces": np.asarray(faces),
    }
    set_scene_config(config)


def set_scene_config(config, state=None):
    _sim.scene = _scene_mod.set_scene(config, state)
    _sim.state = _sim.scene.state
    _sim.sphere_count = 0
    topo = _sim.scene.topo
    # logical particle count (the padded capacity stays internal)
    mesh_verts = np.asarray(config.get("mesh_verts", ()), np.float64)
    if mesh_verts.size:
        _sim.n_particles = mesh_verts.reshape(-1, 3).shape[0]
    else:
        _sim.n_particles = int(config["cloth_size"][0]) * int(
            config["cloth_size"][1])
    _sim.step_fn = jax.jit(
        lambda s: _solver_step(s, topo, _sim.params))


def step():
    _sim.state = _sim.step_fn(_sim.state)


def render():
    rgb, depth = _render_rgbd(
        _sim.state.positions, _sim.state.active, image_size=_sim.render_dim)
    rgba = np.concatenate(
        [np.asarray(rgb), np.ones(rgb.shape[:2] + (1,), np.float32)], axis=-1)
    # pyflex returns bottom-up flat arrays (callers np.flip them,
    # flex_utils.py:421-422)
    return (np.flip((rgba * 255).astype(np.uint8), 0).reshape(-1),
            np.flip(np.asarray(depth), 0).reshape(-1))


def get_positions():
    n = _sim.n_particles
    return np.asarray(_sim.state.get_positions())[: n * 4]


def set_positions(flat):
    arr = np.asarray(flat, np.float32).reshape(-1, 4)
    pos = np.array(_sim.state.positions)
    im = np.array(_sim.state.inv_mass)
    pos[: arr.shape[0]] = arr[:, :3]
    im[: arr.shape[0]] = arr[:, 3]
    _sim.state = _sim.state.replace(
        positions=pos, inv_mass=im)


def get_velocities():
    return np.asarray(_sim.state.get_velocities())[: _sim.n_particles * 3]


def set_velocities(flat):
    arr = np.asarray(flat, np.float32).reshape(-1, 3)
    vel = np.array(_sim.state.velocities)
    vel[: arr.shape[0]] = arr
    _sim.state = _sim.state.replace(velocities=vel)


def get_phases():
    return np.zeros(_sim.n_particles, np.int32)


def set_phases(phases):
    pass  # single cloth phase group


def get_faces():
    topo = _sim.scene.topo
    if hasattr(topo, "triangles"):
        tris = np.asarray(topo.triangles)[np.asarray(topo.tri_mask)]
        return tris.reshape(-1)
    from flingbot_tpu.engine.topology import grid_triangles_np

    return grid_triangles_np(int(topo.dimx), int(topo.dimy)).reshape(-1)


def add_sphere(radius, position, quat):
    """Picker spheres (flex_utils.py:83)."""
    i = _sim.sphere_count
    if i < _sim.state.picker_pos.shape[0]:
        _sim.state = _sim.state.replace(
            picker_pos=_sim.state.picker_pos.at[i].set(
                np.asarray(position, np.float32)))
    _sim.sphere_count += 1


def get_shape_states():
    pp = np.asarray(_sim.state.picker_pos)
    out = np.zeros((pp.shape[0], 14), np.float32)
    out[:, :3] = pp
    out[:, 3:6] = pp
    out[:, 6] = 1.0
    out[:, 10] = 1.0
    return out.reshape(-1)


def set_shape_states(flat):
    sp = np.asarray(flat, np.float32).reshape(-1, 14)
    k = min(sp.shape[0], _sim.state.picker_pos.shape[0])
    _sim.state = _sim.state.replace(
        picker_pos=_sim.state.picker_pos.at[:k].set(sp[:k, :3]))


def set_camera_params(params):
    pass  # fixed top-down camera; kept for API parity
