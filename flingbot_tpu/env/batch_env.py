"""BatchSimEnv: hundreds of environments as one vmapped program.

This replaces the reference's Ray actor pool + async harvest loop
(utils.py:144-157, 394-418).  Where the reference isolates one CUDA solver
per process and polls futures, here a batch of env states is ONE pytree with
a leading env axis; action selection, primitive rollout, stabilization,
reward and observation all vmap over it, and the env axis can be sharded
over a device mesh (flingbot_tpu.parallel) so the same program scales from
one chip to a pod slice.

Async pipelining is unnecessary: primitives run in lockstep inside the
vmapped while_loop (slow envs pad to the batch max — the trade for zero
host round-trips), and episode resets are host-side slot writes between
steps.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from flingbot_tpu.engine.state import SolverParams
from flingbot_tpu.env.observation import compute_observation
from flingbot_tpu.env.primitives import (
    STABLE_MAX_STEPS,
    PrimitiveConfig,
    program_chunk,
)
from flingbot_tpu.env.scene import set_scene
from flingbot_tpu.env.sim_env import (
    PARK_PICKERS,
    step_begin,
    step_core,
    step_finish,
)
from flingbot_tpu.env.coverage import get_current_covered_area
from flingbot_tpu.engine.solver import step as solver_step
from flingbot_tpu.learning.memory import Memory

import warnings

# Largest chunked-exec device call (in sim steps) allowed on MESH (shirt)
# topologies.  See the clamp in BatchSimEnv.__init__: mesh steps are much
# slower than grid steps and a rect-tuned chunk length can exceed the TPU
# worker's per-call wall-time limit (~50-80 s -> kernel fault, CLAUDE.md).
MESH_CHUNK_STEPS_CAP = 32


def _tree_stack(items):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)


class BatchSimEnv:
    """A batch of grid-cloth environments stepping in lockstep on device."""

    def __init__(
        self,
        get_task_fn: Callable,
        num_envs: int,
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
        self_collision: bool = True,
        spring_mode: str = "gs",
        contact_mode: str = "block",
        contact_every: int = 1,
        contact_iterations: int = 8,
        contact_window: int = 16,
        backend: str = "xla",
        substeps: int = 4,
        iterations: int = 30,
        aero: bool = False,
        max_grid_dim: int = 104,
        mesh_caps=None,
        layered_spec=None,
        sharding=None,
        domain_randomization: bool = True,
        seed: int = 0,
        dump_visualizations: bool = False,
        env_chunk: Optional[int] = None,
        obs_chunk: Optional[int] = None,
        exec_mode: str = "chunked",
        chunk_steps: int = 64,
        chunk_loop: str = "while",
        solver_overrides=None,
        surface_render: bool = True,
        **_unused,
    ):
        self.get_task_fn = get_task_fn
        self.num_envs = num_envs
        self.replay_buffer_path = replay_buffer_path
        self.obs_dim = obs_dim
        self.episode_length = episode_length
        self.image_dim = render_dim
        self.action_primitives = tuple(action_primitives)
        if "fling" in self.action_primitives:
            self.rotations = np.array(
                [(2 * i / (num_rotations - 1) - 1) * 90
                 for i in range(num_rotations)], np.float32)
        else:
            self.rotations = np.array(
                [(2 * i / num_rotations - 1) * 180
                 for i in range(num_rotations)], np.float32)
        self.scale_factors = np.asarray(scale_factors, np.float32)
        self.conservative_grasp_radius = conservative_grasp_radius
        self.use_adaptive_scaling = use_adaptive_scaling
        self.reach_distance_limit = reach_distance_limit
        self.pix = dict(
            pix_grasp_dist=pix_grasp_dist,
            pix_drag_dist=pix_drag_dist,
            pix_place_dist=pix_place_dist,
        )
        self.sim_kw = dict(
            self_collision=self_collision, spring_mode=spring_mode,
            contact_mode=contact_mode,
            contact_every=contact_every,
            contact_iterations=contact_iterations,
            contact_window=contact_window, backend=backend,
            substeps=substeps, iterations=iterations, aero=aero)
        self.max_grid_dim = max_grid_dim
        self.mesh_caps = mesh_caps
        # layered (stencil) shirt path: grid-speed, so no mesh chunk clamp
        self.layered_spec = layered_spec
        if layered_spec is not None:
            assert mesh_caps is None, \
                "pass either mesh_caps (gather path) or layered_spec"
            if self.sim_kw["contact_mode"] != "sort":
                # the layered solver implements the production sort-based
                # contact group only (same as the pallas grid path)
                warnings.warn(
                    "layered topology: contact_mode "
                    f"{self.sim_kw['contact_mode']!r} -> 'sort' (the only "
                    "contact group the layered shirt path implements)")
                self.sim_kw["contact_mode"] = "sort"
        self.prim_cfg = PrimitiveConfig(
            grasp_height=grasp_height,
            fling_speed=fling_speed,
            fixed_fling_height=fixed_fling_height,
            stretchdrag_dist=stretchdrag_dist,
        )
        self.params = SolverParams()
        if solver_overrides:
            if isinstance(solver_overrides, str):
                import json as _json

                solver_overrides = _json.loads(solver_overrides)
            self.params = self.params.replace(
                **{k: jnp.float32(v) for k, v in solver_overrides.items()})
            if not aero and any(
                    float(solver_overrides.get(k, 0.0)) != 0.0
                    for k in ("drag", "lift")):
                # drag/lift are runtime params, but the aero pass itself is
                # a static flag — silently leaving it off would make the
                # overrides no-ops (the 2026-08-19 knob-sweep bug: lift
                # rows measured base physics)
                warnings.warn("solver_overrides set drag/lift but "
                              "aero=False; enabling the aero pass")
                self.sim_kw["aero"] = True
        self.sharding = sharding
        # Two executions of the device step:
        #   * "chunked" (default): host-driven chunks of <= chunk_steps sim
        #     steps per device call (primitives.program_chunk).  Bounded
        #     per-call wall time is what prevents the round-2 TPU worker
        #     kernel fault on long-running programs, so the whole batch can
        #     run as one program (env_chunk defaults to num_envs).
        #   * "fused": the round-2 single-while_loop step (step_core); the
        #     batch axis is split over <= env_chunk envs per call (default
        #     32 — larger fused programs ran long enough to crash the TPU
        #     worker) — one compile, sequential dispatch.
        assert exec_mode in ("chunked", "fused")
        self.exec_mode = exec_mode
        self.chunk_steps = int(chunk_steps)
        self._perf_chunks = 0
        if mesh_caps is not None and exec_mode == "chunked" \
                and self.chunk_steps > MESH_CHUNK_STEPS_CAP:
            # Mesh (shirt) sim steps are far slower per step than the
            # grid stencil path, so a chunk length tuned for rect cloths
            # can push one device call past the ~50-80 s wall-time limit
            # that kernel-faults the TPU worker (measured 2026-08-18:
            # 192-step mesh chunks at batch 16 crashed the worker; grid
            # 192-step chunks at batch 128 are ~11 s).  Clamp with margin
            # until the mesh per-step cost is measured on TPU
            # (scripts/probe_mesh_tpu.py).
            warnings.warn(
                f"mesh topology: clamping chunk_steps {self.chunk_steps} "
                f"-> {MESH_CHUNK_STEPS_CAP} (TPU per-call wall-time limit)")
            self.chunk_steps = MESH_CHUNK_STEPS_CAP
        if env_chunk is None:
            env_chunk = num_envs if exec_mode == "chunked" else 32
        self.env_chunk = min(env_chunk, num_envs) if env_chunk else num_envs
        if num_envs % self.env_chunk != 0:
            # round down to a divisor instead of aborting (a ragged final
            # chunk would need a second program shape / padding)
            c = self.env_chunk
            while num_envs % c != 0:
                c -= 1
            self.env_chunk = c
        # Observation gets its OWN (smaller) batch cap: the 96-view warp
        # stack is ~(C+1, T, D, D) f32 per env and XLA pads the 64-lane
        # minor dim 2x, so a full-width observe call holds multiple
        # (B, 96, *, 64, 64) temps — at B=256 that OOM'd the chip (20.3G
        # used / 15.75G HBM, 2026-08-19) while the sim step itself runs
        # fine at 256+.  64 envs/observe-call keeps the warp temps ~1.1G.
        if obs_chunk is None:
            obs_chunk = 64
        self.obs_chunk = min(int(obs_chunk), self.num_envs)
        while num_envs % self.obs_chunk != 0:
            self.obs_chunk -= 1

        self.tasks = [None] * num_envs
        self.memories = [Memory() for _ in range(num_envs)]
        self.timesteps = np.zeros(num_envs, np.int64)
        self.init_coverage = np.zeros(num_envs, np.float64)
        self.episodes_done = 0

        self.dump_visualizations = dump_visualizations
        self.record_frames = 256 if dump_visualizations else 0
        self.record_every = 8
        self._frames = [[] for _ in range(num_envs)]
        self._vm_step = jax.jit(
            jax.vmap(
                functools.partial(
                    step_core,
                    primitives=self.action_primitives,
                    prim_cfg=self.prim_cfg,
                    record_frames=self.record_frames,
                    record_every=self.record_every,
                    **self.pix,
                    **self.sim_kw,
                ),
                in_axes=(0, 0, None, 0, 0, None),
            )
        )
        # chunked-execution trio (see exec_mode note above)
        self._vm_begin = jax.jit(
            jax.vmap(
                functools.partial(
                    step_begin,
                    primitives=self.action_primitives,
                    prim_cfg=self.prim_cfg,
                    record_frames=self.record_frames,
                    **self.pix,
                ),
                in_axes=(0, 0, None, 0, 0, None),
            )
        )
        self._vm_chunk = jax.jit(
            jax.vmap(
                functools.partial(
                    program_chunk,
                    chunk_steps=self.chunk_steps,
                    loop=chunk_loop,
                    # the chunked program ENDS in a STABILIZE phase; the
                    # fused path budgets stabilize separately on top of
                    # max_program_steps (sim_env.step_core), so the chunked
                    # cap must include it or long programs lose their
                    # settle (fused/chunked parity in the long-episode
                    # regime)
                    max_steps=(self.prim_cfg.max_program_steps
                               + STABLE_MAX_STEPS),
                    record_frames=self.record_frames,
                    record_every=self.record_every,
                    **self.sim_kw,
                ),
                in_axes=(0, 0, None, 0),
            )
        )
        self._vm_finish = jax.jit(
            jax.vmap(
                functools.partial(
                    step_finish, record_frames=self.record_frames),
            )
        )
        self.domain_randomization = domain_randomization
        self._dr_rng = np.random.RandomState(seed)
        self._dr_keys = None  # (B, 2) uint32, re-drawn per episode
        obs_fn = functools.partial(
            compute_observation,
            image_size=self.image_dim,
            obs_dim=self.obs_dim,
            conservative_grasp_radius=self.conservative_grasp_radius,
            use_adaptive_scaling=self.use_adaptive_scaling,
            reach_distance_limit=self.reach_distance_limit,
        )
        self.surface_render = surface_render
        if not surface_render:
            # particle-splat fallback: faces args accepted and ignored
            if domain_randomization:
                self._vm_observe = jax.jit(jax.vmap(
                    lambda p, a, f, fm, r, s, k: obs_fn(
                        p, a, r, s, dr_key=k),
                    in_axes=(0, 0, None, None, None, None, 0)))
            else:
                self._vm_observe = jax.jit(jax.vmap(
                    lambda p, a, f, fm, r, s: obs_fn(p, a, r, s),
                    in_axes=(0, 0, None, None, None, None)))
        elif domain_randomization:
            self._vm_observe = jax.jit(jax.vmap(
                lambda p, a, f, fm, r, s, k: obs_fn(
                    p, a, r, s, dr_key=k, faces=f, tri_mask=fm),
                in_axes=(0, 0, 0, 0, None, None, 0)))
        else:
            self._vm_observe = jax.jit(jax.vmap(
                lambda p, a, f, fm, r, s: obs_fn(
                    p, a, r, s, faces=f, tri_mask=fm),
                in_axes=(0, 0, 0, 0, None, None)))
        self._vm_settle = jax.jit(
            jax.vmap(
                lambda s, t: solver_step(s, t, self.params, **self.sim_kw),
                in_axes=(0, 0),
            )
        )
        self._vm_coverage = jax.jit(jax.vmap(get_current_covered_area))

    # ------------------------------------------------------------------

    def _load_scene(self, task):
        """Grid OR mesh (shirt) task -> (topo, state).  All envs in one
        batch must share a topology type (mesh tasks additionally share the
        static mesh_caps bucket so their pytrees stack)."""
        scene = set_scene(task.get_config(), task.get_state(),
                          max_grid_dim=self.max_grid_dim,
                          mesh_caps=self.mesh_caps,
                          layered_spec=self.layered_spec)
        state = scene.state.replace(picker_pos=jnp.asarray(PARK_PICKERS))
        return scene.topo, state

    def _fresh_dr_key(self):
        return jax.random.PRNGKey(self._dr_rng.randint(2 ** 31))

    def _chunked(self, fn, batched, vm, obs, static, rot):
        """Apply the vmapped step over env chunks and concat the outputs
        (see env_chunk note in __init__)."""
        C = self.env_chunk
        B = self.num_envs
        if C >= B:
            return fn(batched[0], batched[1], static[0], vm, obs, rot)
        outs = []
        for s in range(0, B, C):
            sl = lambda x: x[s:s + C]
            outs.append(fn(
                jax.tree_util.tree_map(sl, batched[0]),
                jax.tree_util.tree_map(sl, batched[1]),
                static[0],
                vm[s:s + C],
                jax.tree_util.tree_map(sl, obs),
                rot))
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    def reset(self):
        """Load a task into every env slot and compute the first obs."""
        topos, states = [], []
        for i in range(self.num_envs):
            self.tasks[i] = self.get_task_fn()
            topo, state = self._load_scene(self.tasks[i])
            topos.append(topo)
            states.append(state)
            self.memories[i] = Memory()
            self.timesteps[i] = 0
            self._frames[i] = []
        if self.domain_randomization:
            self._dr_keys = jnp.stack(
                [self._fresh_dr_key() for _ in range(self.num_envs)])
        self.topo = _tree_stack(topos)
        self.state = _tree_stack(states)
        if self.sharding is not None:
            self.state = jax.device_put(self.state, self.sharding)
        self.state = self._chunked_simple(
            self._vm_settle, self.state, self.topo)
        self.init_coverage[:] = np.asarray(self._chunked_simple(
            self._vm_coverage, self.state.positions, self.state.active))
        self._observe()
        for i in range(self.num_envs):
            self.memories[i].add_value(
                "pretransform_observations", self._pretransform_obs(i))
        return self.obs.obs_stack  # (B, T, 4, D, D)

    def _write_episode_video(self, i: int):
        """on_episode_end video parity for one env slot (simEnv.py:782-807;
        same writer as SimEnv._write_episode_video)."""
        import os

        import cv2

        from flingbot_tpu.render.rasterizer import render_rgbd

        base = os.path.dirname(self.replay_buffer_path or "") or "."
        vis_dir = os.path.join(base, "visualizations")
        os.makedirs(vis_dir, exist_ok=True)
        path = os.path.join(
            vis_dir, f"{self.episodes_done:09d}_env{i}.webm")
        size = 256
        active = self.state.active[i]
        key = (self._dr_keys[i] if (self.domain_randomization
                                    and self._dr_keys is not None) else None)
        render = jax.jit(jax.vmap(
            lambda p: render_rgbd(p, active, image_size=size,
                                  dr_key=key)[0]))
        writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"VP90"), 24, (size, size))
        for chunk in self._frames[i]:
            if chunk.shape[0] == 0:
                continue
            rgb = np.asarray(render(jnp.asarray(chunk)))
            for f in (rgb * 255).astype(np.uint8):
                writer.write(f[..., ::-1])
        writer.release()
        return path

    def _chunked_simple(self, fn, *batched):
        C = self.env_chunk
        B = self.num_envs
        if C >= B:
            return fn(*batched)
        outs = []
        for s in range(0, B, C):
            sl = lambda x: x[s:s + C]
            outs.append(fn(*(jax.tree_util.tree_map(sl, b)
                             for b in batched)))
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    def _cloth_faces(self):
        """Batched (faces (B,T,3), tri_mask (B,T)) for the renderer's
        triangle super-sampling (render/rasterizer.py); (None, None)
        disables it (surface_render=False — the particle-splat fallback)."""
        from flingbot_tpu.engine.topology import (
            GridTopology, grid_triangles_dynamic)

        if not getattr(self, "surface_render", True):
            return None, None
        t = self.topo
        if isinstance(t, GridTopology):
            if not hasattr(self, "_faces_fn"):
                self._faces_fn = jax.jit(jax.vmap(functools.partial(
                    grid_triangles_dynamic,
                    max_dimx=t.max_dimx, max_dimy=t.max_dimy)))
            return self._faces_fn(t.dimx, t.dimy)
        return t.triangles, t.tri_mask

    def _observe(self):
        # free the previous obs stack's device buffers before building the
        # new one — at 256 envs the (B, T, 4, D, D) stack is ~3.2G padded
        # and holding both generations doubles the resident footprint
        self.obs = None
        rot = jnp.asarray(self.rotations)
        sc = jnp.asarray(self.scale_factors)
        C = self.obs_chunk
        B = self.num_envs
        faces, fmask = self._cloth_faces()
        if self.domain_randomization:
            call = lambda p, a, f, fm, k: self._vm_observe(
                p, a, f, fm, rot, sc, k)
            args = (self.state.positions, self.state.active, faces, fmask,
                    self._dr_keys)
        else:
            call = lambda p, a, f, fm: self._vm_observe(p, a, f, fm, rot, sc)
            args = (self.state.positions, self.state.active, faces, fmask)
        if C >= B:
            self.obs = call(*args)
        else:
            outs = []
            for s in range(0, B, C):
                outs.append(call(*(x[s:s + C] for x in args)))
            self.obs = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        # bulk host copies for replay logging (one transfer per step, not
        # one per env).  np.array (not asarray): jax arrays view as
        # READ-ONLY ndarrays, and _observe_subset scatters reloaded slots
        # into these mirrors in place.
        self._rgb_np = np.array(self.obs.rgb)
        self._depth_np = np.array(self.obs.depth)

    def _pretransform_obs(self, i):
        rgb = self._rgb_np[i]
        d = self._depth_np[i]
        return np.concatenate(
            [np.transpose(rgb, (2, 0, 1)), d[None]], axis=0).astype(np.float32)

    def _observe_subset(self, idx_list):
        """Recompute observations for a subset of env slots and scatter them
        into the existing obs pytree (+ host rgb/depth mirrors).

        Reloads touch only the finished slots, but `_observe()` re-renders
        the whole batch — at 256 envs that is a second ~22-26 s full 96-view
        warp per round (round-4 [env.perf] buckets).  The subset is padded
        to the obs-chunk width with repeats of the last index so the calls
        reuse the exact compiled shapes of the chunked full-batch path
        (duplicate scatter indices write identical values).  Values are
        bit-identical to a full `_observe()`: the render is deterministic
        per (state, dr_key) and untouched slots keep their entries."""
        C = min(self.obs_chunk, self.num_envs)
        pad = (-len(idx_list)) % C
        idx = np.asarray(list(idx_list) + [idx_list[-1]] * pad, np.int32)
        rot = jnp.asarray(self.rotations)
        sc = jnp.asarray(self.scale_factors)
        faces, fmask = self._cloth_faces()
        outs = []
        for s in range(0, len(idx), C):
            ii = jnp.asarray(idx[s:s + C])
            pos = self.state.positions[ii]
            act = self.state.active[ii]
            fi = faces[ii] if faces is not None else None
            fmi = fmask[ii] if fmask is not None else None
            if self.domain_randomization:
                outs.append(self._vm_observe(
                    pos, act, fi, fmi, rot, sc, self._dr_keys[ii]))
            else:
                outs.append(self._vm_observe(pos, act, fi, fmi, rot, sc))
        sub = outs[0] if len(outs) == 1 else jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)
        jidx = jnp.asarray(idx)
        self.obs = jax.tree_util.tree_map(
            lambda b, x: b.at[jidx].set(x), self.obs, sub)
        self._rgb_np[idx] = np.asarray(sub.rgb)
        self._depth_np[idx] = np.asarray(sub.depth)

    def _step_device_chunked(self, vm):
        """Chunked-execution device step over env_chunk slices: begin ->
        bounded program chunks until every env is done -> finish.  Output
        tuple matches the fused _vm_step."""
        rot = jnp.asarray(self.rotations)
        C = self.env_chunk
        B = self.num_envs
        # conservative bound on chunk iterations (sim steps incl. the
        # STABILIZE budget + jump-only interpreter iterations)
        max_iters = (self.prim_cfg.max_program_steps + STABLE_MAX_STEPS
                     + 400) // max(1, self.chunk_steps) + 4
        outs = []
        for s in range(0, B, C):
            sl = lambda x: x[s:s + C]
            state_sl = jax.tree_util.tree_map(sl, self.state)
            topo_sl = jax.tree_util.tree_map(sl, self.topo)
            obs_sl = jax.tree_util.tree_map(sl, self.obs)
            sel, pre_cov, pre_pos, carry, prog = self._vm_begin(
                state_sl, topo_sl, self.params, vm[s:s + C], obs_sl, rot)
            # Pipelined dispatch: enqueue chunk k+1 BEFORE blocking on chunk
            # k's done flag, so the host's done-download round-trip (one
            # scalar over the tunnel) overlaps with device execution and the
            # device queue never drains.  A chunk dispatched on an
            # already-done carry is a no-op (program_chunk's loop condition
            # is false at entry), so the single overshoot chunk is free.
            prev_done = None
            chunks_used = 0
            for _ in range(max_iters):
                carry, done = self._vm_chunk(
                    carry, topo_sl, self.params, prog)
                chunks_used += 1
                if prev_done is not None \
                        and bool(np.all(np.asarray(prev_done))):
                    break
                prev_done = done
            self._perf_chunks += chunks_used
            fin = self._vm_finish(carry, pre_pos)
            if self.record_frames > 0:
                new_state, post_cov, terminate, frames, n_frames = fin
                outs.append((new_state, sel, pre_cov, post_cov, terminate,
                             frames, n_frames))
            else:
                new_state, post_cov, terminate = fin
                outs.append((new_state, sel, pre_cov, post_cov, terminate))
        if len(outs) == 1:
            return outs[0]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    def step(self, value_maps):
        """value_maps (B, P, T, D, D) -> next obs stack (B, T, 4, D, D).

        Device: one vmapped step (fused) or a begin/chunk*/finish sequence
        (chunked).  Host: replay logging + per-env resets."""
        vm = jnp.asarray(value_maps)
        prev_stack_dev = self.obs.obs_stack  # gather AFTER sel is known
        _pt0 = time.perf_counter()
        self._perf_chunks = 0
        if self.exec_mode == "chunked":
            out = self._step_device_chunked(vm)
        else:
            out = self._chunked(
                self._vm_step, (self.state, self.topo), vm, self.obs,
                static=(self.params,), rot=jnp.asarray(self.rotations))
        _pt_prog = time.perf_counter()
        if self.record_frames > 0:
            (new_state, sel, pre_cov, post_cov, terminate, frames,
             n_frames) = out
            nf = np.asarray(n_frames)
            for b in range(self.num_envs):
                self._frames[b].append(np.asarray(frames[b][: int(nf[b])]))
        else:
            new_state, sel, pre_cov, post_cov, terminate = out
        self.state = new_state
        self._observe()
        _pt_obs = time.perf_counter()

        pre_cov = np.asarray(pre_cov)
        post_cov = np.asarray(post_cov)
        terminate = np.asarray(terminate)
        # replay stores only the SELECTED transform's observation: gather it
        # on device instead of downloading the whole (B, T, 4, D, D) stack
        # (~800 MB/step at 128 envs over the tunnel)
        sel_obs = np.asarray(jax.vmap(lambda s, t: s[t])(
            prev_stack_dev, sel.transform_idx))
        # one bulk download of the selection pytree (per-element indexing of
        # device arrays would cost B x fields round-trips over the tunnel)
        sel = jax.tree_util.tree_map(np.asarray, sel)

        reload_idx = []
        for i in range(self.num_envs):
            mem = self.memories[i]
            t = int(sel.transform_idx[i])
            prim = self.action_primitives[int(sel.prim_idx[i])]
            mem.add_observation(sel_obs[i])
            mem.add_action(np.asarray(sel.action_mask[i]))
            mem.add_value("preaction_coverage", float(pre_cov[i]))
            mem.add_value("postaction_coverage", float(post_cov[i]))
            mem.add_value("rotation", float(sel.rotation[i]))
            mem.add_value("scale", float(sel.scale[i]))
            mem.add_value("action_primitive", prim)
            mem.add_value("max_indices", np.asarray(
                [t, int(sel.row[i]), int(sel.col[i])]))
            mem.add_value("pretransform_pixels",
                          np.asarray(sel.pretransform_pixels[i]))
            for key, value in self.tasks[i].get_stats().items():
                mem.add_value(key, value)
            self.timesteps[i] += 1
            done = bool(terminate[i]) or (
                self.timesteps[i] >= self.episode_length)
            mem.add_rewards_and_termination(
                float(post_cov[i] - pre_cov[i]), done)
            mem.add_value("next_observations", self._pretransform_obs(i))
            if done:
                if self.dump_visualizations and self._frames[i]:
                    self._write_episode_video(i)
                self._frames[i] = []
                if self.replay_buffer_path is not None and len(mem):
                    mem.dump(self.replay_buffer_path)
                self.episodes_done += 1
                reload_idx.append(i)
            else:
                mem.add_value(
                    "pretransform_observations", self._pretransform_obs(i))

        _pt_replay = time.perf_counter()
        if reload_idx:
            # batched writeback: one scatter per pytree leaf.  The old
            # per-env `_tree_set` loop copied the FULL batched pytree once
            # per reloaded env (48-72 full-batch device copies per round at
            # 256 envs — a large share of the 75-152 s reload bucket).
            new_topos, new_states = [], []
            for i in reload_idx:
                self.tasks[i] = self.get_task_fn()
                topo, state = self._load_scene(self.tasks[i])
                new_topos.append(topo)
                new_states.append(state)
                self.memories[i] = Memory()
                self.timesteps[i] = 0
            jidx = jnp.asarray(np.asarray(reload_idx, np.int32))
            scatter = lambda b, x: b.at[jidx].set(x)
            self.topo = jax.tree_util.tree_map(
                scatter, self.topo, _tree_stack(new_topos))
            self.state = jax.tree_util.tree_map(
                scatter, self.state, _tree_stack(new_states))
            if self.domain_randomization:
                self._dr_keys = self._dr_keys.at[jidx].set(jnp.stack(
                    [self._fresh_dr_key() for _ in reload_idx]))
            # settle reloaded slots exactly like reset() does (set_scene +
            # settle on every reset, flex_utils.py:320-355,430-441): run the
            # settle step on the whole batch but keep only reloaded slots
            settled = self._chunked_simple(
                self._vm_settle, self.state, self.topo)
            self.state = jax.tree_util.tree_map(
                lambda b, s: b.at[jidx].set(s[jidx]), self.state, settled)
            cov = np.asarray(self._chunked_simple(
                self._vm_coverage, self.state.positions, self.state.active))
            for i in reload_idx:
                self.init_coverage[i] = float(cov[i])
            # re-render ONLY the reloaded slots (the second full-batch
            # _observe was the other large reload cost: ~22-26 s/round at
            # 256 envs)
            self._observe_subset(reload_idx)
            for i in reload_idx:
                self.memories[i].add_value(
                    "pretransform_observations", self._pretransform_obs(i))

        # wall-time buckets for the collection-rate diagnosis (the round-4
        # 128-env training run measured ~840 s/fling-round vs ~140 s of pure
        # sim at the benched env-steps rate; these buckets attribute the
        # gap).  Device calls are async, but each bucket ends at a blocking
        # host sync (chunk done-checks / np.asarray downloads), so the
        # attribution is accurate to one queue tail.
        _pt_end = time.perf_counter()
        print(f"[env.perf] program {_pt_prog - _pt0:.1f}s "
              f"(chunks {self._perf_chunks}x{self.chunk_steps}) "
              f"observe {_pt_obs - _pt_prog:.1f}s "
              f"replay {_pt_replay - _pt_obs:.1f}s "
              f"reload {_pt_end - _pt_replay:.1f}s (n={len(reload_idx)}) "
              f"total {_pt_end - _pt0:.1f}s", flush=True)

        return self.obs.obs_stack
