"""Task model, HDF5 task files, and task generation.

Byte-compatible with the reference task format (environment/tasks.py:
287-320, 323-463): an HDF5 file with one group per task; scalars stored as
group attrs, arrays as gzip datasets.  Existing flingbot-rect/shirt eval
task files load unchanged (a hard compat requirement, SURVEY §0).

Task generation (hard = lift-by-random-particle-and-drop, easy = random
vertex tosses; reference tasks.py:105-284) runs on our own engine with the
crumpling rollout jitted on device.
"""

from __future__ import annotations

import functools
import hashlib
from typing import Dict, List, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

try:
    from filelock import FileLock
except ImportError:  # pragma: no cover
    import contextlib

    def FileLock(_path):  # type: ignore
        return contextlib.nullcontext()

from flingbot_tpu.engine.state import ClothState
from flingbot_tpu.engine.solver import step as solver_step
from flingbot_tpu.engine.state import SolverParams
from flingbot_tpu.engine.topology import build_grid_topology, grid_positions
from flingbot_tpu.env import scene as scene_mod
from flingbot_tpu.env.coverage import get_current_covered_area


class Task:
    """One manipulation task: a crumpled-cloth start state + metadata.

    Same constructor keywords, views (get_config / get_state / get_stats)
    and repr fields as the reference Task (environment/tasks.py:323-433), so
    code written against the reference keeps working."""

    def __init__(
        self,
        name: str,
        flatten_area: float,
        initial_coverage: float,
        task_difficulty: str,
        cloth_size: Optional[List] = None,
        flip_mesh: int = 0,
        particle_pos=(),
        particle_vel=(),
        shape_pos=(),
        mesh_verts=(),
        mesh_stretch_edges=(),
        mesh_bend_edges=(),
        mesh_shear_edges=(),
        mesh_faces=(),
        phase=(),
        cloth_stiff=(),
        cloth_mass: float = 0.5,
        cloth_pos=(0, 2, 0),
        **_unused,
    ):
        self.name = name
        self.flatten_area = float(flatten_area)
        self.initial_coverage = float(initial_coverage)
        self.task_difficulty = str(task_difficulty)
        self.cloth_mass = float(cloth_mass)
        self.cloth_size = np.array(cloth_size if cloth_size is not None else [-1, -1])
        self.particle_pos = np.array(particle_pos)
        self.particle_vel = np.array(particle_vel)
        self.shape_pos = np.array(shape_pos)
        self.phase = np.array(phase)
        self.cloth_pos = np.array(cloth_pos)
        self.cloth_stiff = np.array(cloth_stiff)
        self.flip_mesh = int(flip_mesh)
        self.mesh_verts = np.array(mesh_verts)
        if self.mesh_verts.size > 0:
            self.cloth_size = np.array([-1, -1])
        self.mesh_stretch_edges = np.array(mesh_stretch_edges)
        self.mesh_bend_edges = np.array(mesh_bend_edges)
        self.mesh_shear_edges = np.array(mesh_shear_edges)
        self.mesh_faces = np.array(mesh_faces)
        # top-down camera (tasks.py:363-371)
        self.camera_pos = np.array([0.0, 2.0, 0.0])
        self.camera_angle = np.array([np.pi * 0.5, -np.pi * 0.5, 0.0])
        self.camera_width = 720
        self.camera_height = 720

    def get_config(self) -> Dict:
        return {
            "cloth_pos": self.cloth_pos,
            "cloth_size": self.cloth_size,
            "cloth_stiff": self.cloth_stiff,
            "cloth_mass": self.cloth_mass,
            "camera_name": "default_camera",
            "camera_params": {
                "default_camera": {
                    "pos": self.camera_pos,
                    "angle": self.camera_angle,
                    "width": self.camera_width,
                    "height": self.camera_height,
                }
            },
            "flip_mesh": self.flip_mesh,
            "flatten_area": self.flatten_area,
            "mesh_verts": self.mesh_verts,
            "mesh_stretch_edges": self.mesh_stretch_edges,
            "mesh_bend_edges": self.mesh_bend_edges,
            "mesh_shear_edges": self.mesh_shear_edges,
            "mesh_faces": self.mesh_faces,
        }

    def get_state(self) -> Dict:
        return {
            "particle_pos": self.particle_pos,
            "particle_vel": self.particle_vel,
            "shape_pos": self.shape_pos,
            "phase": self.phase,
            "camera_params": {
                "default_camera": {
                    "pos": self.camera_pos,
                    "angle": self.camera_angle,
                    "width": self.camera_width,
                    "height": self.camera_height,
                }
            },
        }

    def get_stats(self) -> Dict:
        return {
            "task_name": self.name,
            "cloth_mass": self.cloth_mass,
            "cloth_size": self.cloth_size,
            "cloth_stiff": self.cloth_stiff,
            "max_coverage": self.flatten_area,
            "task_difficulty": self.task_difficulty,
            "init_coverage": self.initial_coverage,
        }

    def __str__(self) -> str:
        pct = self.initial_coverage * 100 / max(self.flatten_area, 1e-9)
        return (
            f"[Task] {self.name}\n"
            f"\ttask_difficulty: {self.task_difficulty}\n"
            f"\tinitial_coverage (%): {pct:.02f}\n"
            f"\tcloth_mass (kg): {self.cloth_mass:.04f}\n"
            f"\tcloth_size: {self.cloth_size}\n"
            f"\tcloth_stiff: {self.cloth_stiff}\n"
            f"\tflatten_area (m^2): {self.flatten_area:.04f}\n"
        )


class TaskLoader:
    """Sequential task reader over a flingbot-format HDF5 file
    (reference: tasks.py:436-463).  With repeat=False it raises StopIteration
    when exhausted instead of sleeping forever."""

    def __init__(self, hdf5_path: str, repeat: bool = True):
        self.hdf5_path = hdf5_path
        self.repeat = repeat
        with h5py.File(hdf5_path, "r") as f:
            self.keys = sorted(f.keys())
        print(f"[TaskLoader] Found {len(self.keys)} tasks from {hdf5_path}")
        self.curr_task_idx = 0

    def __len__(self):
        return len(self.keys)

    def get_next_task(self) -> Task:
        if self.curr_task_idx >= len(self.keys):
            if not self.repeat:
                raise StopIteration("[TaskLoader] Out of tasks")
            self.curr_task_idx = 0
        key = self.keys[self.curr_task_idx]
        self.curr_task_idx += 1
        with h5py.File(self.hdf5_path, "r") as f:
            group = f[key]
            kwargs = dict(group.attrs)
            kwargs.update({k: np.array(group[k]) for k in group})
            return Task(name=key, **kwargs)


def detect_mesh_caps(hdf5_path: str):
    """None for grid task files; the static (verts, edges, tris) padding
    bucket for mesh (shirt) files — so BatchSimEnv callers can stay
    agnostic of the set's cloth type (reference keeps rect and shirt sets
    in separate files, README.md:136-141).

    The bucket is sized to the FILE's measured maxima (rounded up to keep
    the lane dim friendly), capped at the global MESH_*_CAPACITY ceilings:
    padding every shirt to the 8k/64k/16k ceilings cost 2-3.5x solver work
    on sets that top out at ~3.2k verts (v5e mesh probe, 2026-08-19)."""
    from flingbot_tpu.env import scene as _scene

    def _roundup(v, m):
        return int((v + m - 1) // m * m)

    max_v = max_e = max_t = 0
    with h5py.File(hdf5_path, "r") as f:
        for k in f:
            g = f[k]
            if "mesh_verts" not in g:
                return None
            nv = np.asarray(g["mesh_verts"]).size // 3
            if nv == 0:
                return None
            ne = sum(np.asarray(g[n]).size // 2
                     for n in ("mesh_stretch_edges", "mesh_bend_edges",
                               "mesh_shear_edges"))
            nt = np.asarray(g["mesh_faces"]).size // 3
            max_v, max_e, max_t = (max(max_v, nv), max(max_e, ne),
                                   max(max_t, nt))
    if max_v == 0:
        return None
    return (min(_roundup(max_v, 256), _scene.MESH_VERT_CAPACITY),
            min(_roundup(max_e, 1024), _scene.MESH_EDGE_CAPACITY),
            min(_roundup(max_t, 256), _scene.MESH_TRI_CAPACITY))


def detect_layered_spec(hdf5_path: str):
    """LayeredSpec for a mesh (shirt) task file whose every garment is a
    2-layer lattice (the procedural shirts of env/shirts.py are; arbitrary
    Cloth3D geometry may not be) — None for grid files or non-lattice
    meshes.  The layered path runs the stencil spring solve (grid speed)
    instead of the mesh gather path; see engine.topology.LayeredGridTopology."""
    from flingbot_tpu.engine.topology import compute_layered_spec

    names = ("mesh_verts", "mesh_stretch_edges", "mesh_bend_edges",
             "mesh_shear_edges", "mesh_faces")
    tasks = []
    with h5py.File(hdf5_path, "r") as f:
        for k in f:
            g = f[k]
            if "mesh_verts" not in g or np.asarray(g["mesh_verts"]).size == 0:
                return None
            tasks.append({n: np.asarray(g[n]) for n in names})
    if not tasks:
        return None
    return compute_layered_spec(tasks)


def detect_topology_buckets(hdf5_path: str) -> Dict:
    """One-stop bucket detection for env construction: kwargs for
    BatchSimEnv/set_scene.  Grid files -> both None; lattice shirt files ->
    layered_spec (the grid-speed stencil path); other meshes -> mesh_caps
    (the generic gather path)."""
    spec = detect_layered_spec(hdf5_path)
    if spec is not None:
        return {"mesh_caps": None, "layered_spec": spec}
    return {"mesh_caps": detect_mesh_caps(hdf5_path), "layered_spec": None}


def write_task(path: str, task_dict: Dict) -> str:
    """Append one task to an HDF5 file under a sha1 key — the exact schema
    of the reference's generator (tasks.py:305-320)."""
    with FileLock(path + ".lock"):
        with h5py.File(path, "a") as f:
            key = hashlib.sha1(f"{len(f)}".encode()).hexdigest()
            group = f.create_group(key)
            for k, v in task_dict.items():
                if isinstance(v, (float, int, str, np.floating, np.integer)):
                    group.attrs[k] = v
                else:
                    group.create_dataset(
                        name=k, data=v, compression="gzip", compression_opts=9
                    )
    return key


# --------------------------------------------------------------------------
# task generation on our engine
# --------------------------------------------------------------------------


def _sim_n(state, topo, params, n, anchor_idx=None, anchor_pos=None,
           substeps=4, iterations=30):
    """Jitted helper: run n solver steps, optionally holding one particle
    (inv mass 0 + teleport) at anchor_pos — the generator's pickpoint trick
    (reference tasks.py:177-224).  anchor_idx may be a traced scalar; pass
    a negative value (or None) for no anchor."""
    cap = state.num_particles

    def body(st, _):
        if anchor_idx is not None:
            idx = jnp.asarray(anchor_idx, jnp.int32)
            slot = jnp.where(idx >= 0, idx, cap)  # cap -> dropped
            st = st.replace(
                positions=st.positions.at[slot].set(anchor_pos, mode="drop"),
                velocities=st.velocities.at[slot].set(
                    jnp.zeros(3), mode="drop"),
            )
        st = solver_step(st, topo, params, substeps=substeps,
                         iterations=iterations, self_collision=True)
        return st, None

    state, _ = jax.lax.scan(body, state, None, length=n)
    return state


def wait_until_stable(
    state, topo, params, max_steps=300, tolerance=1e-2, chunk=10,
    substeps=4, iterations=30,
):
    """Step until max |v| < tolerance (reference flex_utils.py:430-441),
    checking every `chunk` steps to amortize host sync."""
    fn = jax.jit(
        lambda s: _sim_n(s, topo, params, chunk, substeps=substeps,
                         iterations=iterations)
    )
    for _ in range(max_steps // chunk):
        state = fn(state)
        if float(jnp.max(jnp.abs(
                jnp.where(state.active[:, None], state.velocities, 0.0)))) \
                < tolerance:
            return state, True
    return state, False


def generate_randomization(
    rng: np.random.Generator,
    min_cloth_size: int = 64,
    max_cloth_size: int = 104,
    strict_min_edge_length: int = 64,
    task_difficulty: str = "hard",
    cloth_type: str = "square",
    cloth_mesh_path: Optional[str] = None,
    params: Optional[SolverParams] = None,
    max_grid_dim: int = 104,
    mesh_caps=None,
) -> Optional[Dict]:
    """Generate one crumpled-cloth task (reference tasks.py:105-284).

    square: sample size/stiffness/mass, flatten, then crumple by either
    anchoring a random particle at a random height and dropping ('hard') or
    tossing 10 random vertices ('easy'); reject states with particles above
    0.4 m."""
    params = params or SolverParams()
    dimx = int(rng.integers(min_cloth_size, max_cloth_size))
    dimy = int(rng.integers(min_cloth_size, max_cloth_size))
    if dimx < strict_min_edge_length and dimy < strict_min_edge_length:
        return None
    if cloth_type == "mesh":
        from pathlib import Path
        import random as _random

        from flingbot_tpu.engine.topology import load_cloth

        assert cloth_mesh_path is not None
        objs = list(Path(cloth_mesh_path).rglob("*_processed.obj"))
        path = str(_random.choice(objs))
        verts, faces, se, be, she = load_cloth(path)
        mesh_arrays = dict(
            mesh_verts=verts.reshape(-1),
            mesh_stretch_edges=se.reshape(-1),
            mesh_bend_edges=be.reshape(-1),
            mesh_shear_edges=she.reshape(-1),
            mesh_faces=faces.reshape(-1),
        )
        dimx, dimy = -1, -1
        num_particles = verts.shape[0]
        # flattened area ~ half the two-sided mesh area (tasks.py:142)
        v = verts
        t = v[faces]
        flattened_area = float(
            0.5 * np.linalg.norm(
                np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1
            ).sum() / 2
        )
    else:
        mesh_arrays = dict(
            mesh_verts=np.array([]),
            mesh_stretch_edges=np.array([]),
            mesh_bend_edges=np.array([]),
            mesh_shear_edges=np.array([]),
            mesh_faces=np.array([]),
        )
        num_particles = dimx * dimy
        flattened_area = None

    stiffness = rng.uniform(0.85, 0.95, 3)
    cloth_mass = float(rng.uniform(0.2, 2.0))
    config = {
        "cloth_pos": [0, 1, 0],
        "cloth_size": [dimx, dimy],
        "cloth_stiff": stiffness,
        "cloth_mass": cloth_mass,
        "flip_mesh": 0,
        **mesh_arrays,
    }
    scene = scene_mod.make_scene(config, max_grid_dim=max_grid_dim,
                             mesh_caps=mesh_caps)
    topo, state = scene.topo, scene.state

    if cloth_type == "mesh":
        pos = np.array(state.positions)
        pos[:num_particles] = np.asarray(
            mesh_arrays["mesh_verts"], np.float32).reshape(-1, 3)
        pos[:num_particles, 1] += 0.1
        state = state.replace(positions=jnp.asarray(pos))
        state = jax.jit(lambda s: _sim_n(s, topo, params, 40))(state)
    else:
        flat = scene_mod.flatten_positions(scene)
        pos = np.array(state.positions)
        pos[: flat.shape[0]] = flat
        state = state.replace(
            positions=jnp.asarray(pos),
            velocities=jnp.zeros_like(state.velocities),
        )
        flattened_area = float(
            get_current_covered_area(state.positions, state.active)
        )

    state = _center(state)

    # one jitted mover reused for every task/toss (anchor_idx is traced)
    move_fn = jax.jit(
        lambda s, i, p: _sim_n(s, topo, params, 1, anchor_idx=i, anchor_pos=p)
    )

    def anchored_sweep(state, pickpoint, start, target, n_move):
        """Drag particle `pickpoint` from start to target over n_move steps
        with inv mass pinned to 0, then restore it."""
        saved_w = float(state.inv_mass[pickpoint])
        state = state.replace(inv_mass=state.inv_mass.at[pickpoint].set(0.0))
        idx = jnp.int32(pickpoint)
        for j in range(n_move):
            p = jnp.asarray(start + (target - start) * (j / n_move),
                            jnp.float32)
            state = move_fn(state, idx, p)
        return state, saved_w

    if task_difficulty == "hard":
        pickpoint = int(rng.integers(0, num_particles))
        height = float(rng.random() * 1.0 + 0.5)
        start = np.asarray(state.positions[pickpoint])
        target = np.array([start[0], height, start[2]])
        state, saved_w = anchored_sweep(state, pickpoint, start, target, 200)
        # hold at height until the dangling cloth stabilizes, then drop
        hold = jnp.asarray(target, jnp.float32)
        idx = jnp.int32(pickpoint)
        hold_fn = jax.jit(
            lambda s: _sim_n(s, topo, params, 10, anchor_idx=idx,
                             anchor_pos=hold)
        )
        for _ in range(30):
            state = hold_fn(state)
            vmax = float(jnp.max(jnp.abs(
                jnp.where(state.active[:, None], state.velocities, 0.0))))
            if vmax < 1e-1:
                break
        state = state.replace(
            inv_mass=state.inv_mass.at[pickpoint].set(saved_w))
    elif task_difficulty == "easy":
        for _ in range(10):
            pickpoint = int(rng.integers(0, num_particles))
            displacement = rng.uniform(-0.2, 0.2, 3)
            displacement[1] = 0.2
            start = np.asarray(state.positions[pickpoint])
            state, saved_w = anchored_sweep(
                state, pickpoint, start, start + displacement, 100)
            state = state.replace(
                inv_mass=state.inv_mass.at[pickpoint].set(saved_w))
    else:
        raise NotImplementedError(task_difficulty)

    state, _ = wait_until_stable(state, topo, params)
    heights = np.asarray(state.positions)[np.asarray(state.active), 1]
    if heights.max() > 0.4:
        return None  # probably an error (tasks.py:262-265)
    state = _center(state)

    # shirts (mesh cloths) get their own difficulty tag so stats keep them
    # out of the rect "hard" family (the reference keeps the sets in
    # separate files; README.md:136-141)
    recorded_difficulty = ("shirt" if cloth_type == "mesh"
                           else task_difficulty)

    n = num_particles
    pos4 = np.concatenate(
        [np.asarray(state.positions[:n]),
         np.asarray(state.inv_mass[:n])[:, None]], axis=1
    )
    return {
        "particle_pos": pos4.reshape(-1),
        "particle_vel": np.asarray(state.velocities[:n]).reshape(-1),
        "initial_coverage": float(
            get_current_covered_area(state.positions, state.active)),
        "shape_pos": np.zeros(2 * 14, np.float32),
        "phase": np.zeros(n, np.int32),
        "flatten_area": float(flattened_area),
        "flip_mesh": 0,
        "cloth_size": np.array([dimx, dimy]),
        "cloth_stiff": stiffness,
        "cloth_mass": cloth_mass,
        "task_difficulty": recorded_difficulty,
        **mesh_arrays,
    }


def _center(state: ClothState) -> ClothState:
    """center_object parity (flex_utils.py:313-317)."""
    p = state.positions
    act = state.active[:, None]
    mean = jnp.sum(jnp.where(act, p, 0.0), axis=0) / jnp.maximum(
        jnp.sum(state.active), 1
    )
    shift = jnp.array([mean[0], 0.0, mean[2]], jnp.float32)
    return state.replace(positions=jnp.where(act, p - shift, p))


def _crumple_hard_batch(state, topo, params, pick_idx, start, target,
                        sweep_steps, hold_steps, settle_steps, sim_kw):
    """Vmapped 'hard' crumple: drag particle `pick_idx` from start to target,
    hold, release, settle.  All step counts static; per-env pick/target
    traced.  state/topo are batched pytrees (leading env axis)."""

    def one_env(st, tp, idx, p0, p1):
        cap = st.num_particles
        saved_w = st.inv_mass[idx]
        st = st.replace(inv_mass=st.inv_mass.at[idx].set(0.0))

        def sweep(j, st):
            p = p0 + (p1 - p0) * (j.astype(jnp.float32) / sweep_steps)
            st = st.replace(
                positions=st.positions.at[idx].set(p),
                velocities=st.velocities.at[idx].set(jnp.zeros(3)),
            )
            return solver_step(st, tp, params, **sim_kw)

        st = jax.lax.fori_loop(0, sweep_steps, sweep, st)

        def hold(_, st):
            st = st.replace(
                positions=st.positions.at[idx].set(p1),
                velocities=st.velocities.at[idx].set(jnp.zeros(3)),
            )
            return solver_step(st, tp, params, **sim_kw)

        st = jax.lax.fori_loop(0, hold_steps, hold, st)
        st = st.replace(inv_mass=st.inv_mass.at[idx].set(saved_w))

        def settle_cond(c):
            st, k = c
            vmax = jnp.max(jnp.abs(
                jnp.where(st.active[:, None], st.velocities, 0.0)))
            return (k < settle_steps) & (vmax >= 1e-2)

        def settle_body(c):
            st, k = c
            return solver_step(st, tp, params, **sim_kw), k + 1

        st, _ = jax.lax.while_loop(settle_cond, settle_body,
                                   (st, jnp.int32(0)))
        return st

    return jax.vmap(one_env)(state, topo, pick_idx, start, target)


def _crumple_easy_batch(state, topo, params, pick_idx, disps,
                        sweep_steps, settle_steps, sim_kw):
    """Vmapped 'easy' crumple: 10 random vertex tosses per env
    (reference tasks.py:225-258).  pick_idx (B, 10) i32; disps (B, 10, 3)."""

    def one_env(st, tp, idxs, ds):
        def one_toss(st, toss):
            idx, d = toss
            saved_w = st.inv_mass[idx]
            st = st.replace(inv_mass=st.inv_mass.at[idx].set(0.0))
            p0 = st.positions[idx]
            p1 = p0 + d

            def sweep(j, st):
                p = p0 + (p1 - p0) * (j.astype(jnp.float32) / sweep_steps)
                st = st.replace(
                    positions=st.positions.at[idx].set(p),
                    velocities=st.velocities.at[idx].set(jnp.zeros(3)),
                )
                return solver_step(st, tp, params, **sim_kw)

            st = jax.lax.fori_loop(0, sweep_steps, sweep, st)
            st = st.replace(inv_mass=st.inv_mass.at[idx].set(saved_w))
            return st, None

        st, _ = jax.lax.scan(one_toss, st, (idxs, ds))

        def settle_cond(c):
            st, k = c
            vmax = jnp.max(jnp.abs(
                jnp.where(st.active[:, None], st.velocities, 0.0)))
            return (k < settle_steps) & (vmax >= 1e-2)

        def settle_body(c):
            st, k = c
            return solver_step(st, tp, params, **sim_kw), k + 1

        st, _ = jax.lax.while_loop(settle_cond, settle_body,
                                   (st, jnp.int32(0)))
        return st

    return jax.vmap(one_env)(state, topo, pick_idx, disps)


def _anchored_chunk(state, topo, idx, p0, p1, s0, *, n_steps, sweep_steps,
                    params, sim_kw):
    """K steps of the anchored sweep/hold schedule for one env: the anchor
    particle tracks p0 -> p1 over sweep_steps, then holds at p1.  The
    anchor's inv_mass is pinned to 0 by the caller."""

    def body(i, st):
        s = (s0 + i).astype(jnp.float32)
        frac = jnp.minimum(s, sweep_steps) / sweep_steps
        p = p0 + (p1 - p0) * frac
        st = st.replace(
            positions=st.positions.at[idx].set(p),
            velocities=st.velocities.at[idx].set(jnp.zeros(3)),
        )
        return solver_step(st, topo, params, **sim_kw)

    return jax.lax.fori_loop(0, n_steps, body, state)


def _toss_chunk(state, topo, idxs, disps, p0, p1, saved_w, s0, *, n_steps,
                sweep_steps, params, sim_kw):
    """K steps of the 'easy' 10-toss schedule for one env (reference
    tasks.py:225-258): toss t = s // sweep_steps, within-toss j = s %
    sweep_steps.  Pin/record at j==0, restore inv_mass at j==sweep-1.
    p1 = p0 + d is computed once at toss entry and interpolated as
    p0 + (p1 - p0) * frac — bit-identical to the single-program path."""
    cap = state.num_particles

    def body(i, carry):
        st, p0, p1, saved_w = carry
        s = s0 + i
        t = s // sweep_steps
        j = s % sweep_steps
        idx = idxs[jnp.clip(t, 0, idxs.shape[0] - 1)]
        entry = j == 0
        saved_w = jnp.where(entry, st.inv_mass[idx], saved_w)
        d = disps[jnp.clip(t, 0, disps.shape[0] - 1)]
        p0 = jnp.where(entry, st.positions[idx], p0)
        p1 = jnp.where(entry, p0 + d, p1)
        st = st.replace(inv_mass=st.inv_mass.at[idx].set(0.0))
        p = p0 + (p1 - p0) * (j.astype(jnp.float32) / sweep_steps)
        st = st.replace(
            positions=st.positions.at[idx].set(p),
            velocities=st.velocities.at[idx].set(jnp.zeros(3)),
        )
        st = solver_step(st, topo, params, **sim_kw)
        exit_ = j == sweep_steps - 1
        restore_slot = jnp.where(exit_, idx, cap)
        st = st.replace(inv_mass=st.inv_mass.at[restore_slot].set(
            saved_w, mode="drop"))
        return (st, p0, p1, saved_w)

    return jax.lax.fori_loop(0, n_steps, body, (state, p0, p1, saved_w))


def _settle_chunk(state, topo, k0, *, n_steps, max_settle, tol, params,
                  sim_kw):
    """Up to K settle steps with the per-env vmax early exit.  Returns
    (state, k, vmax) so the host can decide doneness."""

    def vmax_of(st):
        return jnp.max(jnp.abs(
            jnp.where(st.active[:, None], st.velocities, 0.0)))

    def cond(c):
        st, k = c
        return (k < k0 + n_steps) & (k < max_settle) & (vmax_of(st) >= tol)

    def body(c):
        st, k = c
        return solver_step(st, topo, params, **sim_kw), k + 1

    st, k = jax.lax.while_loop(cond, body, (state, k0))
    return st, k, vmax_of(st)


def generate_tasks_batch(
    path: str,
    num_tasks: int,
    batch: int = 64,
    seed: int = 0,
    min_cloth_size: int = 64,
    max_cloth_size: int = 104,
    strict_min_edge_length: int = 64,
    task_difficulty: str = "hard",
    max_grid_dim: int = 104,
    backend: str = "xla",
    spring_mode: str = "gs",
    contact_mode: str = "block",
    contact_every: int = 2,
    log: bool = True,
    chunk_steps: int = 64,
    schedule=None,
    solver_params: "SolverParams | None" = None,
) -> int:
    """Batched task generation: `batch` crumpling rollouts run as one
    vmapped device program — the TPU replacement for the reference's N Ray
    workers (tasks.py:466-501).  'hard' (lift-and-drop) and 'easy' (10
    random tosses) square cloths; fall back to generate_tasks for mesh.

    With chunk_steps > 0 (default) each device call runs at most that many
    sim steps (host-driven chunking, same rationale as
    primitives.program_chunk: bounded per-call wall time is what keeps the
    TPU worker alive at batch >= 64); chunk_steps=0 restores the round-2
    single-program path."""
    assert task_difficulty in ("hard", "easy")
    rng = np.random.default_rng(seed)
    params = solver_params if solver_params is not None else SolverParams()
    # resumable: count existing tasks so an interrupted run (or a TPU
    # worker crash) picks up where it left off
    import os as _os

    count0 = 0
    if _os.path.exists(path):
        with h5py.File(path, "r") as f:
            count0 = len(f.keys())
        if count0:
            print(f"[generate_tasks_batch] resuming: {count0} tasks exist",
                  flush=True)
            rng = np.random.default_rng(seed + count0)
    sim_kw = dict(substeps=4, iterations=30, self_collision=True,
                  backend=backend, spring_mode=spring_mode,
                  contact_mode=contact_mode, contact_every=contact_every)
    # (sweep, hold, settle[, tosses]) — overridable for fast tests
    if schedule is not None:
        SWEEP, HOLD, SETTLE = schedule[:3]
        TOSSES = schedule[3] if len(schedule) > 3 else 10
    else:
        SWEEP, HOLD, SETTLE = (200, 120, 300) if task_difficulty == "hard" \
            else (100, 0, 300)
        TOSSES = 10
    if chunk_steps:
        K = int(chunk_steps)
        # build the jitted chunk programs ONCE (incl. the ragged final
        # chunk's size, which is deterministic) — rebuilding the
        # functools.partial per call would retrace every task batch
        if task_difficulty == "hard":
            anchored = jax.jit(jax.vmap(
                functools.partial(
                    _anchored_chunk, n_steps=K, sweep_steps=SWEEP,
                    params=params, sim_kw=sim_kw),
                in_axes=(0, 0, 0, 0, 0, None)))
            rag = (SWEEP + HOLD) % K
            anchored_part = None if rag == 0 else jax.jit(jax.vmap(
                functools.partial(
                    _anchored_chunk, n_steps=rag, sweep_steps=SWEEP,
                    params=params, sim_kw=sim_kw),
                in_axes=(0, 0, 0, 0, 0, None)))
        else:
            tosser = jax.jit(jax.vmap(
                functools.partial(
                    _toss_chunk, n_steps=K, sweep_steps=SWEEP,
                    params=params, sim_kw=sim_kw),
                in_axes=(0, 0, 0, 0, 0, 0, 0, None)))
            rag = (TOSSES * SWEEP) % K
            tosser_part = None if rag == 0 else jax.jit(jax.vmap(
                functools.partial(
                    _toss_chunk, n_steps=rag, sweep_steps=SWEEP,
                    params=params, sim_kw=sim_kw),
                in_axes=(0, 0, 0, 0, 0, 0, 0, None)))
        settler = jax.jit(jax.vmap(
            functools.partial(
                _settle_chunk, n_steps=K, max_settle=SETTLE, tol=1e-2,
                params=params, sim_kw=sim_kw),
            in_axes=(0, 0, 0)))

        def crumple_chunked(batch_state, batch_topo, pick_idx,
                            start=None, target=None, disps=None):
            B = pick_idx.shape[0]
            if task_difficulty == "hard":
                # pin anchors, run sweep+hold in K-step chunks, unpin
                saved_w = jax.vmap(lambda st, i: st.inv_mass[i])(
                    batch_state, pick_idx)
                batch_state = jax.vmap(
                    lambda st, i: st.replace(
                        inv_mass=st.inv_mass.at[i].set(0.0)))(
                    batch_state, pick_idx)
                total = SWEEP + HOLD
                for s0 in range(0, total, K):
                    fn = anchored if total - s0 >= K else anchored_part
                    batch_state = fn(batch_state, batch_topo, pick_idx,
                                     start, target, jnp.int32(s0))
                batch_state = jax.vmap(
                    lambda st, i, w: st.replace(
                        inv_mass=st.inv_mass.at[i].set(w)))(
                    batch_state, pick_idx, saved_w)
            else:
                total = TOSSES * SWEEP
                p0 = jnp.zeros((B, 3), jnp.float32)
                p1 = jnp.zeros((B, 3), jnp.float32)
                sw = jnp.zeros((B,), jnp.float32)
                carry = (batch_state, p0, p1, sw)
                for s0 in range(0, total, K):
                    fn = tosser if total - s0 >= K else tosser_part
                    carry = fn(carry[0], batch_topo, pick_idx, disps,
                               carry[1], carry[2], carry[3], jnp.int32(s0))
                batch_state = carry[0]
            # settle with per-env early exit, host-checked per chunk
            k = jnp.zeros((B,), jnp.int32)
            while True:
                batch_state, k, vmax = settler(batch_state, batch_topo, k)
                done = (np.asarray(vmax) < 1e-2) | (np.asarray(k) >= SETTLE)
                if done.all():
                    break
            return batch_state

        crumple = crumple_chunked
    elif task_difficulty == "hard":
        crumple = jax.jit(functools.partial(
            _crumple_hard_batch, params=params, sweep_steps=SWEEP,
            hold_steps=HOLD, settle_steps=SETTLE, sim_kw=sim_kw))
    else:
        crumple = jax.jit(functools.partial(
            _crumple_easy_batch, params=params, sweep_steps=SWEEP,
            settle_steps=SETTLE, sim_kw=sim_kw))

    count = count0
    while count < num_tasks:
        dims, stiffs, masses = [], [], []
        while len(dims) < batch:
            dx = int(rng.integers(min_cloth_size, max_cloth_size))
            dy = int(rng.integers(min_cloth_size, max_cloth_size))
            if dx < strict_min_edge_length and dy < strict_min_edge_length:
                continue
            dims.append((dx, dy))
            stiffs.append(rng.uniform(0.85, 0.95, 3))
            masses.append(float(rng.uniform(0.2, 2.0)))

        topos, states, flat_areas, picks, starts, targets = \
            [], [], [], [], [], []
        for (dx, dy), stiff, mass in zip(dims, stiffs, masses):
            topo = build_grid_topology(
                dx, dy, stiffness=tuple(float(s) for s in stiff),
                max_dimx=max_grid_dim, max_dimy=max_grid_dim)
            n = dx * dy
            flat = grid_positions(dx, dy, lower=(0.0, 0.00625, 0.0))
            flat[:, [0, 2]] -= flat[:, [0, 2]].mean(axis=0, keepdims=True)
            st = ClothState.create(
                flat, np.full(n, n / mass, np.float32),
                capacity=max_grid_dim * max_grid_dim)
            flat_areas.append(float(get_current_covered_area(
                st.positions, st.active)))
            if task_difficulty == "hard":
                pick = int(rng.integers(0, n))
                height = float(rng.random() * 1.0 + 0.5)
                p0 = flat[pick].copy()
                p1 = np.array([p0[0], height, p0[2]], np.float32)
                picks.append(pick)
                starts.append(p0)
                targets.append(p1)
            else:
                picks.append(rng.integers(0, n, TOSSES).astype(np.int32))
                d = rng.uniform(-0.2, 0.2, (TOSSES, 3)).astype(np.float32)
                d[:, 1] = 0.2
                targets.append(d)
            topos.append(topo)
            states.append(st)

        batch_topo = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *topos)
        batch_state = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *states)
        if task_difficulty == "hard":
            out = crumple(batch_state, batch_topo,
                          pick_idx=jnp.asarray(picks, jnp.int32),
                          start=jnp.asarray(np.stack(starts)),
                          target=jnp.asarray(np.stack(targets)))
        else:
            out = crumple(batch_state, batch_topo,
                          pick_idx=jnp.asarray(np.stack(picks)),
                          disps=jnp.asarray(np.stack(targets)))
        out = jax.vmap(_center)(out)
        positions = np.asarray(out.positions)
        velocities = np.asarray(out.velocities)
        inv_mass = np.asarray(out.inv_mass)
        active = np.asarray(out.active)
        coverages = np.asarray(jax.vmap(get_current_covered_area)(
            out.positions, out.active))

        for i, (dx, dy) in enumerate(dims):
            if count >= num_tasks:
                break
            n = dx * dy
            heights = positions[i][active[i], 1]
            if heights.max() > 0.4:
                continue  # probably an error (tasks.py:262-265)
            pos4 = np.concatenate(
                [positions[i][:n], inv_mass[i][:n, None]], axis=1)
            write_task(path, {
                "particle_pos": pos4.reshape(-1),
                "particle_vel": velocities[i][:n].reshape(-1),
                "initial_coverage": float(coverages[i]),
                "shape_pos": np.zeros(2 * 14, np.float32),
                "phase": np.zeros(n, np.int32),
                "flatten_area": flat_areas[i],
                "flip_mesh": 0,
                "cloth_size": np.array([dx, dy]),
                "cloth_stiff": stiffs[i],
                "cloth_mass": masses[i],
                "task_difficulty": task_difficulty,
                "mesh_verts": np.array([]),
                "mesh_stretch_edges": np.array([]),
                "mesh_bend_edges": np.array([]),
                "mesh_shear_edges": np.array([]),
                "mesh_faces": np.array([]),
            })
            count += 1
        if log:
            print(f"[generate_tasks_batch] {count}/{num_tasks}", flush=True)
    return count


def generate_tasks(
    path: str,
    num_tasks: int,
    seed: int = 0,
    log: bool = True,
    **kwargs,
) -> int:
    """Generate tasks into an HDF5 file (CLI parity: tasks.py:466-501).
    num_tasks is the TOTAL target: existing tasks count toward it, so an
    interrupted run resumes instead of overshooting."""
    import os as _os

    count = 0
    if _os.path.exists(path):
        with h5py.File(path, "r") as f:
            count = len(f.keys())
        if count:
            print(f"[generate_tasks] resuming: {count} tasks exist",
                  flush=True)
    rng = np.random.default_rng(seed + count)
    while count < num_tasks:
        task = generate_randomization(rng, **kwargs)
        if task is None:
            continue
        write_task(path, task)
        count += 1
        if log:
            print(f"[generate_tasks] {count}/{num_tasks}")
    return count


if __name__ == "__main__":
    # CLI parity with `python environment/tasks.py` (reference
    # tasks.py:466-501); batched device generation replaces the Ray pool.
    import argparse

    p = argparse.ArgumentParser("flingbot task generation")
    p.add_argument("--path", required=True)
    p.add_argument("--num_tasks", type=int, default=200)
    p.add_argument("--task_difficulty", default="hard",
                   choices=["hard", "easy"])
    p.add_argument("--cloth_type", default="square",
                   choices=["square", "mesh"])
    p.add_argument("--cloth_mesh_path", default=None)
    p.add_argument("--min_cloth_size", type=int, default=64)
    p.add_argument("--max_cloth_size", type=int, default=104)
    p.add_argument("--strict_min_edge_length", type=int, default=64)
    p.add_argument("--max_grid_dim", type=int, default=104)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--backend", default="xla")
    p.add_argument("--spring_mode", default="gs")
    p.add_argument("--contact_mode", default="block")
    p.add_argument("--sequential", action="store_true",
                   help="use the per-task generator (required for easy/mesh)")
    a = p.parse_args()

    if a.cloth_type == "square" and not a.sequential:
        generate_tasks_batch(
            a.path, a.num_tasks, batch=a.batch, seed=a.seed,
            min_cloth_size=a.min_cloth_size, max_cloth_size=a.max_cloth_size,
            strict_min_edge_length=a.strict_min_edge_length,
            max_grid_dim=a.max_grid_dim, backend=a.backend,
            spring_mode=a.spring_mode, contact_mode=a.contact_mode)
    else:
        generate_tasks(
            a.path, a.num_tasks, seed=a.seed,
            min_cloth_size=a.min_cloth_size, max_cloth_size=a.max_cloth_size,
            strict_min_edge_length=a.strict_min_edge_length,
            task_difficulty=a.task_difficulty, cloth_type=a.cloth_type,
            cloth_mesh_path=a.cloth_mesh_path, max_grid_dim=a.max_grid_dim)
