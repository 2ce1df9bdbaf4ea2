"""SimEnv: the cloth-unfolding environment, API-compatible with the
reference SimEnv (environment/simEnv.py:32-816) but with the entire
act -> simulate -> reward -> observe loop living on device.

One env.step(value_maps):
  1. dense masked-argmax action selection        (action.py; simEnv.py:560-661)
  2. primitive execution as a trajectory program (primitives.py; :262-429)
  3. postaction stabilization + no-move early exit           (:466-477)
  4. delta-coverage reward                                   (:479-502)
  5. on-device RGB-D render -> 96-view transform stack       (:690-737)

The Ray-actor surface (setup_ray / ray_handle, simEnv.py:815-816) is gone:
batching over envs is jax.vmap (see batch_env.py), not process pools.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flingbot_tpu.engine.picker import release_all
from flingbot_tpu.engine.solver import step as solver_step
from flingbot_tpu.engine.state import SolverParams
from flingbot_tpu.env.action import ActionSelection, select_action
from flingbot_tpu.env.coverage import get_current_covered_area
from flingbot_tpu.env.observation import Observation, compute_observation
from flingbot_tpu.env.primitives import (
    _RESET_TARGETS,
    PROGRAM_BUILDERS,
    STABLE_MAX_STEPS,
    STABLE_TOL,
    PrimitiveConfig,
    build_selected_program,
    init_program_carry,
    program_chunk,
    run_program,
)
from flingbot_tpu.env.scene import set_scene
from flingbot_tpu.env.tasks import Task
from flingbot_tpu.learning.memory import Memory

# single source of truth for the stabilize/park constants is primitives.py:
# the chunked STABILIZE phase and this fused postaction must stay
# numerically identical (test_chunked_exec asserts it)
PARK_PICKERS = np.asarray(_RESET_TARGETS, np.float32)
NO_MOVE_EPS = 5e-2  # postaction early-exit threshold (simEnv.py:475-477)


def _stabilize(state, topo, params, *, substeps, iterations, self_collision,
               spring_mode, contact_mode="block", contact_every=1,
               contact_iterations=8, contact_window=16,
               backend="xla", aero=False,
               max_steps=STABLE_MAX_STEPS, tol=STABLE_TOL):
    """wait_until_stable as a bounded while_loop (flex_utils.py:430-441)."""

    def vmax(st):
        return jnp.max(jnp.abs(
            jnp.where(st.active[:, None], st.velocities, 0.0)))

    def cond(c):
        st, k = c
        return (k < max_steps) & (vmax(st) >= tol)

    def body(c):
        st, k = c
        st = solver_step(st, topo, params, substeps=substeps,
                         iterations=iterations, self_collision=self_collision,
                         spring_mode=spring_mode, contact_mode=contact_mode,
                         contact_every=contact_every,
                         contact_iterations=contact_iterations,
                         contact_window=contact_window, backend=backend,
                         aero=aero)
        return st, k + 1

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return state


@functools.partial(
    jax.jit,
    static_argnames=("primitives", "prim_cfg", "pix_grasp_dist",
                     "pix_drag_dist", "pix_place_dist", "substeps",
                     "iterations", "self_collision", "spring_mode",
                     "contact_mode", "contact_every", "contact_iterations",
                     "contact_window", "backend", "aero",
                     "record_frames", "record_every"),
)
def step_core(
    state,
    topo,
    params: SolverParams,
    value_maps: jnp.ndarray,  # (P, T, D, D)
    obs: Observation,
    rotations: jnp.ndarray,
    primitives: Sequence[str],
    prim_cfg: PrimitiveConfig,
    pix_grasp_dist: int = 8,
    pix_drag_dist: int = 10,
    pix_place_dist: int = 10,
    substeps: int = 4,
    iterations: int = 30,
    self_collision: bool = True,
    spring_mode: str = "gs",
    contact_mode: str = "block",
    contact_every: int = 1,
    contact_iterations: int = 8,
    contact_window: int = 16,
    backend: str = "xla",
    record_frames: int = 0,
    record_every: int = 8,
    aero: bool = False,
):
    """Device-side env step: action -> primitive -> stabilize -> reward.

    With record_frames > 0 also returns (frames, n_frames) captured during
    primitive execution (episode videos, simEnv.py:764-768)."""
    sel = select_action(
        value_maps, obs, rotations, primitives=primitives,
        pix_grasp_dist=pix_grasp_dist, pix_drag_dist=pix_drag_dist,
        pix_place_dist=pix_place_dist,
    )
    pre_pos = state.positions
    pre_cov = get_current_covered_area(state.positions, state.active)

    sim_kw = dict(substeps=substeps, iterations=iterations,
                  self_collision=self_collision, spring_mode=spring_mode,
                  contact_mode=contact_mode,
                  contact_every=contact_every,
                  contact_iterations=contact_iterations,
                  contact_window=contact_window, backend=backend,
                  aero=aero)

    def make_branch(prim_name):
        def branch(st):
            prog, init_fh = PROGRAM_BUILDERS[prim_name](
                sel.p1_world, sel.p2_world, sel.p1_grasp, sel.p2_grasp,
                prim_cfg)
            dist = jnp.linalg.norm(sel.p1_world - sel.p2_world)
            return run_program(
                st, topo, params, prog, dist, init_fh,
                max_steps=prim_cfg.max_program_steps,
                record_frames=record_frames, record_every=record_every,
                **sim_kw)
        return branch

    branches = [make_branch(p) for p in primitives]
    if len(branches) == 1:
        out = branches[0](state)
    else:
        out = jax.lax.switch(sel.prim_idx, branches, state)
    if record_frames > 0:
        state, prim_term, frames, n_frames = out
    else:
        state, prim_term = out
        frames, n_frames = None, None

    # postaction (simEnv.py:469-477): release, park arms, settle
    state = release_all(state)
    state = state.replace(picker_pos=jnp.asarray(PARK_PICKERS))
    state = _stabilize(state, topo, params, **sim_kw)

    disp = jnp.max(jnp.where(
        state.active,
        jnp.linalg.norm(state.positions - pre_pos, axis=1),
        0.0,
    ))
    no_move = disp < NO_MOVE_EPS
    post_cov = get_current_covered_area(state.positions, state.active)
    terminate = prim_term | no_move
    if record_frames > 0:
        return state, sel, pre_cov, post_cov, terminate, frames, n_frames
    return state, sel, pre_cov, post_cov, terminate


def step_begin(
    state,
    topo,
    params: SolverParams,
    value_maps: jnp.ndarray,  # (P, T, D, D)
    obs: Observation,
    rotations: jnp.ndarray,
    primitives: Sequence[str],
    prim_cfg: PrimitiveConfig,
    pix_grasp_dist: int = 8,
    pix_drag_dist: int = 10,
    pix_place_dist: int = 10,
    record_frames: int = 0,
):
    """Chunked-execution step, part 1: action selection + program build.

    Returns (sel, pre_cov, pre_pos, carry, program).  The host then loops
    `carry, done = program_chunk(carry, ...)` (primitives.py) until done —
    the program already ends in a STABILIZE phase, so no separate
    postaction call is needed — and finally calls step_finish."""
    sel = select_action(
        value_maps, obs, rotations, primitives=primitives,
        pix_grasp_dist=pix_grasp_dist, pix_drag_dist=pix_drag_dist,
        pix_place_dist=pix_place_dist,
    )
    pre_cov = get_current_covered_area(state.positions, state.active)
    prog, init_fh = build_selected_program(
        primitives, sel.prim_idx, sel.p1_world, sel.p2_world,
        sel.p1_grasp, sel.p2_grasp, prim_cfg, stabilize=True)
    dist = jnp.linalg.norm(sel.p1_world - sel.p2_world)
    carry = init_program_carry(state, dist, init_fh, record_frames)
    return sel, pre_cov, state.positions, carry, prog


def step_finish(carry, pre_pos, record_frames: int = 0):
    """Chunked-execution step, part 3: no-move early-exit + reward inputs
    (postaction, simEnv.py:469-502)."""
    state = carry.state
    disp = jnp.max(jnp.where(
        state.active,
        jnp.linalg.norm(state.positions - pre_pos, axis=1),
        0.0,
    ))
    no_move = disp < NO_MOVE_EPS
    post_cov = get_current_covered_area(state.positions, state.active)
    terminate = carry.terminate | no_move
    if record_frames > 0:
        return state, post_cov, terminate, carry.frames, carry.frame_idx
    return state, post_cov, terminate


class SimEnv:
    """Host-side orchestrator for a single environment.

    Constructor keywords mirror the reference SimEnv (simEnv.py:33-116);
    `gui`, Ray and Blender specifics are intentionally gone."""

    def __init__(
        self,
        get_task_fn: Callable[[], Task],
        replay_buffer_path: Optional[str] = None,
        obs_dim: int = 64,
        num_rotations: int = 12,
        scale_factors: Sequence[float] = (1.0, 1.5, 2.0, 2.5),
        action_primitives: Sequence[str] = ("fling",),
        pix_grasp_dist: int = 8,
        pix_drag_dist: int = 10,
        pix_place_dist: int = 10,
        stretchdrag_dist: float = 0.3,
        reach_distance_limit: float = 1.2,
        fixed_fling_height: float = -1.0,
        conservative_grasp_radius: int = 1,
        use_adaptive_scaling: bool = True,
        grasp_height: float = 0.02,
        fling_speed: float = 6e-3,
        episode_length: int = 10,
        render_dim: int = 400,
        particle_radius: float = 0.00625,
        dump_visualizations: bool = False,
        self_collision: bool = True,
        spring_mode: str = "gs",
        contact_mode: str = "block",
        contact_every: int = 1,
        contact_iterations: int = 8,
        contact_window: int = 16,
        backend: str = "xla",
        substeps: int = 4,
        iterations: int = 30,
        max_grid_dim: int = 104,
        mesh_caps=None,
        domain_randomization: bool = True,
        seed: int = 0,
        **_unused,
    ):
        self.get_task_fn = get_task_fn
        self.replay_buffer_path = replay_buffer_path
        self.obs_dim = obs_dim
        self.image_dim = render_dim
        self.episode_length = episode_length
        self.particle_radius = particle_radius
        self.action_primitives = tuple(action_primitives)
        # rotations formula (simEnv.py:70-76)
        if "fling" in self.action_primitives:
            self.rotations = np.array(
                [(2 * i / (num_rotations - 1) - 1) * 90
                 for i in range(num_rotations)], np.float32)
        else:
            self.rotations = np.array(
                [(2 * i / num_rotations - 1) * 180
                 for i in range(num_rotations)], np.float32)
        self.scale_factors = np.asarray(scale_factors, np.float32)
        self.adaptive_scale_factors = self.scale_factors.copy()
        self.use_adaptive_scaling = use_adaptive_scaling
        self.conservative_grasp_radius = conservative_grasp_radius
        self.pix_grasp_dist = pix_grasp_dist
        self.pix_drag_dist = pix_drag_dist
        self.pix_place_dist = pix_place_dist
        self.reach_distance_limit = reach_distance_limit
        self.dump_visualizations = dump_visualizations
        self.self_collision = self_collision
        self.spring_mode = spring_mode
        self.contact_mode = contact_mode
        self.contact_every = contact_every
        self.contact_iterations = contact_iterations
        self.contact_window = contact_window
        self.backend = backend
        self.substeps = substeps
        self.iterations = iterations
        self.max_grid_dim = max_grid_dim
        self.mesh_caps = mesh_caps
        self.prim_cfg = PrimitiveConfig(
            grasp_height=grasp_height,
            fling_speed=fling_speed,
            fixed_fling_height=fixed_fling_height,
            stretchdrag_dist=stretchdrag_dist,
        )
        self.params = SolverParams()

        self.record_frames = 384 if dump_visualizations else 0
        self.record_every = 8
        self._episode_frames: List[np.ndarray] = []
        self.current_task: Optional[Task] = None
        self.episode_memory = Memory()
        self.current_timestep = 0
        self.terminate = False
        self.episode_count = 0
        self.domain_randomization = domain_randomization
        self._dr_rng = np.random.RandomState(seed)
        self.dr_key = None  # per-episode render randomization key

    # ------------------------------------------------------------------

    def _cloth_faces(self):
        """(faces, tri_mask) for the renderer's triangle super-sampling
        (render/rasterizer.py surface_sample_points)."""
        from flingbot_tpu.engine.topology import (
            GridTopology, grid_triangles_dynamic)

        if isinstance(self.topo, GridTopology):
            return grid_triangles_dynamic(
                self.topo.dimx, self.topo.dimy,
                self.topo.max_dimx, self.topo.max_dimy)
        return self.topo.triangles, self.topo.tri_mask

    def _observe(self) -> Observation:
        faces, tri_mask = self._cloth_faces()
        obs = compute_observation(
            self.state.positions,
            self.state.active,
            jnp.asarray(self.rotations),
            jnp.asarray(self.scale_factors),
            image_size=self.image_dim,
            obs_dim=self.obs_dim,
            conservative_grasp_radius=self.conservative_grasp_radius,
            use_adaptive_scaling=self.use_adaptive_scaling,
            reach_distance_limit=self.reach_distance_limit,
            dr_key=self.dr_key,
            faces=faces,
            tri_mask=tri_mask,
        )
        self.adaptive_scale_factors = np.asarray(obs.adaptive_scales)
        return obs

    def get_transformations(self) -> List:
        return [
            (float(r), float(s))
            for r in self.rotations for s in self.adaptive_scale_factors
        ]

    def reset(self):
        self.episode_memory = Memory()
        self.current_timestep = 0
        self.terminate = False
        if self.domain_randomization:
            # fresh per-episode render randomization (render_rgbd.py:10-54)
            self.dr_key = jax.random.PRNGKey(self._dr_rng.randint(2 ** 31))
        self.current_task = self.get_task_fn()
        scene = set_scene(
            self.current_task.get_config(), self.current_task.get_state(),
            max_grid_dim=self.max_grid_dim, mesh_caps=self.mesh_caps)
        self.topo = scene.topo
        self.state = scene.state.replace(
            picker_pos=jnp.asarray(PARK_PICKERS))
        self.state = solver_step(
            self.state, self.topo, self.params,
            substeps=self.substeps, iterations=self.iterations,
            self_collision=self.self_collision, spring_mode=self.spring_mode,
            contact_mode=self.contact_mode,
            contact_every=self.contact_every, backend=self.backend)
        self.init_coverage = float(get_current_covered_area(
            self.state.positions, self.state.active))
        self.obs = self._observe()
        self.episode_memory.add_value(
            "pretransform_observations", self._pretransform_obs())
        return self.obs.obs_stack

    def _pretransform_obs(self) -> np.ndarray:
        rgb = np.asarray(self.obs.rgb)
        d = np.asarray(self.obs.depth)
        return np.concatenate(
            [np.transpose(rgb, (2, 0, 1)), d[None]], axis=0
        ).astype(np.float32)

    def step(self, value_maps):
        """value_maps: {primitive: (T, D, D)} or (P, T, D, D) array.
        Returns the next transformed obs stack (T, 4, D, D)."""
        if isinstance(value_maps, dict):
            vm = jnp.stack(
                [jnp.asarray(value_maps[p]) for p in self.action_primitives])
        else:
            vm = jnp.asarray(value_maps)

        out = step_core(
            self.state, self.topo, self.params, vm, self.obs,
            jnp.asarray(self.rotations),
            primitives=self.action_primitives,
            prim_cfg=self.prim_cfg,
            pix_grasp_dist=self.pix_grasp_dist,
            pix_drag_dist=self.pix_drag_dist,
            pix_place_dist=self.pix_place_dist,
            substeps=self.substeps,
            iterations=self.iterations,
            self_collision=self.self_collision,
            spring_mode=self.spring_mode,
            contact_mode=self.contact_mode,
            contact_every=self.contact_every,
            contact_iterations=self.contact_iterations,
            contact_window=self.contact_window,
            backend=self.backend,
            record_frames=self.record_frames,
            record_every=self.record_every,
        )
        if self.record_frames > 0:
            (new_state, sel, pre_cov, post_cov, terminate, frames,
             n_frames) = out
            self._episode_frames.append(
                np.asarray(frames[: int(n_frames)]))
        else:
            new_state, sel, pre_cov, post_cov, terminate = out
        self.state = new_state
        self._log_step(sel, vm, float(pre_cov), float(post_cov))

        self.current_timestep += 1
        self.terminate = bool(terminate) or (
            self.current_timestep >= self.episode_length)
        reward = float(post_cov) - float(pre_cov)
        self.episode_memory.add_rewards_and_termination(
            reward, self.terminate)

        self.obs = self._observe()
        self.episode_memory.add_value(
            "next_observations", self._pretransform_obs())
        if self.terminate:
            self.on_episode_end()
            return self.reset()
        self.episode_memory.add_value(
            "pretransform_observations", self._pretransform_obs())
        return self.obs.obs_stack

    def _log_step(self, sel: ActionSelection, vm, pre_cov, post_cov):
        """log_step_stats parity (simEnv.py:434-464)."""
        mem = self.episode_memory
        t = int(sel.transform_idx)
        prim = self.action_primitives[int(sel.prim_idx)]
        mem.add_observation(np.asarray(self.obs.obs_stack[t]))
        mem.add_action(np.asarray(sel.action_mask))
        mem.add_value("preaction_coverage", pre_cov)
        mem.add_value("postaction_coverage", post_cov)
        mem.add_value("rotation", float(sel.rotation))
        mem.add_value("scale", float(sel.scale))
        mem.add_value("value_map", np.asarray(vm[int(sel.prim_idx), t]))
        mem.add_value("action_primitive", prim)
        mem.add_value("max_indices", np.asarray(
            [t, int(sel.row), int(sel.col)]))
        mem.add_value("pretransform_pixels",
                      np.asarray(sel.pretransform_pixels))
        for key, value in self.current_task.get_stats().items():
            mem.add_value(key, value)

    def on_episode_end(self):
        self.episode_count += 1
        if self.dump_visualizations and self._episode_frames:
            self._write_episode_video()
        self._episode_frames = []
        if self.replay_buffer_path is not None and len(self.episode_memory):
            self.episode_memory.dump(self.replay_buffer_path)
        self.episode_memory = Memory()

    def _write_episode_video(self):
        """Render the recorded particle snapshots and write a browser-
        playable webm next to the replay buffer — on_episode_end parity
        (simEnv.py:782-807; the reference writes mp4s keyed by episode)."""
        import os

        import cv2

        from flingbot_tpu.render.rasterizer import render_rgbd

        base = os.path.dirname(self.replay_buffer_path or "") or "."
        vis_dir = os.path.join(base, "visualizations")
        os.makedirs(vis_dir, exist_ok=True)
        path = os.path.join(vis_dir, f"{self.episode_count - 1:09d}.webm")
        size = 256
        render = jax.jit(jax.vmap(
            lambda p: render_rgbd(p, self.state.active, image_size=size,
                                  dr_key=self.dr_key)[0]))
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"VP90"), 24, (size, size))
        for chunk in self._episode_frames:
            if chunk.shape[0] == 0:
                continue
            rgb = np.asarray(render(jnp.asarray(chunk)))
            for f in (rgb * 255).astype(np.uint8):
                writer.write(f[..., ::-1])  # RGB -> BGR
        writer.release()
        return path

    # -- small parity helpers ------------------------------------------

    def compute_coverage(self) -> float:
        return float(get_current_covered_area(
            self.state.positions, self.state.active))

    def is_cloth_grasped(self) -> bool:
        ys = np.asarray(self.state.positions[:, 1])
        return bool(ys.max() > 0.2)
