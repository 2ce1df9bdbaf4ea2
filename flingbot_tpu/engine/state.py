"""Core pytrees: cloth particle state and solver parameters.

The reference keeps all particle state in a host/device mirrored ``SimBuffers``
struct (reference: PyFlex/bindings/main.cpp:226-291) and pushes it through the
closed-source NvFlex CUDA solver each frame via NvFlexSet*/NvFlexGet* calls
(main.cpp:2244-2297).  Here the entire state is a JAX pytree that lives in HBM
for the whole episode; there is no host round-trip inside the step loop.

Solver parameter semantics mirror the subset of ``NvFlexParams``
(reference: PyFlex/include/NvFlex.h:95-154) that the flingbot cloth scene
actually exercises (reference: PyFlex/bindings/softgym_scenes/
softgym_cloth.h:154-170 and main.cpp:748-828 defaults).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import struct

# Physical constants of the flingbot cloth scene.
# reference: environment/flex_utils.py:272 (particle radius),
# PyFlex/bindings/main.cpp:717 (dt), softgym_cloth.h:154-170 (solver knobs).
PARTICLE_RADIUS = 0.00625
DEFAULT_DT = 1.0 / 100.0
DEFAULT_SUBSTEPS = 4
DEFAULT_ITERATIONS = 30

# Maximum grid cloth edge in particles (reference: tasks.py max_cloth_size=104)
MAX_GRID_DIM = 104

NUM_PICKERS = 2

# the reference scene's friction constant (softgym_cloth.h:164) — see the
# dynamic_friction field comment for why the production default differs
FLEX_SCENE_FRICTION = 0.75


class SolverParams(struct.PyTreeNode):
    """XPBD solver parameters (all leaves are scalars -> cheap to vmap over).

    Field semantics follow NvFlexParams (reference: NvFlex.h:95-154); defaults
    are the values the flingbot scene runs with
    (softgym_cloth.h:154-170 over main.cpp:748-828).
    """

    dt: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(DEFAULT_DT))
    gravity: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.0, -9.8, 0.0], jnp.float32)
    )
    # viscous velocity damping (NvFlex.h:117 'damping'; scene sets 1.0)
    damping: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    # friction of particles against shapes/plane (NvFlex.h:105).  The FleX
    # scene CONSTANT is 0.75 (softgym_cloth.h:164), but FleX applies shape
    # friction once per step while this engine's Coulomb projection runs
    # per contact pass, so the numerically-equal mu over-brakes the
    # drag-across-floor phase of a fling.  0.1 is the BEHAVIORALLY
    # calibrated production value (round-5 knob sweep,
    # runs/round5/knob_sweep*.jsonl: best-of-16 oracle coverage on 8 hard
    # tasks 0.60 @ mu=.75 -> 0.70 @ .25 -> 1.00 @ .1; hard-100 heuristic
    # best@3 0.52 -> 0.62 -> 0.745 — only mu~=0.1 reproduces the
    # reference's >0.80-capable fling).  FLEX_SCENE_FRICTION restores the
    # raw scene constant (--flex_parity preset).
    dynamic_friction: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.1)
    )
    # scale of friction between particles (NvFlex.h:107; scene: 1.0)
    particle_friction: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1.0)
    )
    # Coulomb friction of the picker SPHERE shapes (XLA-path experimental
    # knob; production = 0 — A/B-measured immaterial because grasped
    # particles are anchored, see solver.solve_picker_spheres)
    picker_friction: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    # interaction radius for particle-particle collision
    # (NvFlex.h:100; scene: particle_radius * 1.8)
    radius: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(PARTICLE_RADIUS * 1.8)
    )
    # distance particles maintain against shapes/plane (NvFlex.h:145; 0.005)
    collision_distance: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.005)
    )
    # cloth aero (NvFlex.h:120-122). flingbot leaves these at 0.
    drag: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    lift: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    wind: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.array([0.0, 0.0, 0.0], jnp.float32)
    )
    # successive over-relaxation factor (NvFlex.h:153; scene: 1.0)
    relaxation_factor: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(1.0)
    )
    # acceleration clamp (main.cpp:786 'maxAcceleration' ~10x gravity)
    max_acceleration: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(100.0)
    )
    # Chebyshev semi-iterative spectral-radius estimate (Wang 2015 ~0.99;
    # no NvFlex analog — FleX's accelerator is internal).  A RUNTIME value
    # on both backends (pallas carries it in the packed param vector), so
    # rho sweeps recompile nothing.
    chebyshev_rho: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(0.992)
    )

    @classmethod
    def flingbot_defaults(cls) -> "SolverParams":
        return cls()


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Static (trace-time) configuration of a cloth scene.

    Mirrors the 19-float scene param vector + mesh arrays the reference packs
    for pyflex.set_scene (reference: environment/flex_utils.py:320-355,
    softgym_cloth.h:41-66), but as a typed host-side object.  Everything here
    determines array *shapes* or compile-time constants, so it is hashable and
    usable as a static jit argument.
    """

    num_particles: int  # padded particle capacity
    substeps: int = DEFAULT_SUBSTEPS
    iterations: int = DEFAULT_ITERATIONS
    self_collision: bool = True
    # grid cloths: (dimx, dimy) in particles; mesh cloths: None
    grid_dims: "tuple[int, int] | None" = None

    def __post_init__(self):
        if self.grid_dims is not None:
            dimx, dimy = self.grid_dims
            assert dimx * dimy <= self.num_particles


class ClothState(struct.PyTreeNode):
    """Complete per-env simulator state (the HBM-resident SimBuffers analog).

    Shapes (N = padded particle capacity):
      positions   (N, 3) f32   particle positions, world frame, y up
      velocities  (N, 3) f32
      inv_mass    (N,)   f32   0 => kinematically anchored (picked / pinned)
      rest_inv_mass (N,) f32   inv mass before any picker grabbed it
                               (reference: flex_utils.py:100-101)
      active      (N,)   bool  valid-particle mask (padding is False)
      picker_pos  (P, 3) f32   gripper sphere centers
                               (reference Picker, flex_utils.py:35-205)
      picked_idx  (P,)   i32   index of grasped particle, -1 if none
      grasp_offset(P, 3) f32   particle position relative to picker at grasp
      time        ()     f32   sim time
      sweep_perm  (N,)   i32   cached Morton ordering for self-collision
      sweep_inv   (N,)   i32   (re-sorted every resort_interval steps)
      step_count  ()     i32
    """

    positions: jnp.ndarray
    velocities: jnp.ndarray
    inv_mass: jnp.ndarray
    rest_inv_mass: jnp.ndarray
    active: jnp.ndarray
    picker_pos: jnp.ndarray
    picked_idx: jnp.ndarray
    grasp_offset: jnp.ndarray
    time: jnp.ndarray
    sweep_perm: jnp.ndarray
    sweep_inv: jnp.ndarray
    step_count: jnp.ndarray

    @property
    def num_particles(self) -> int:
        return self.positions.shape[0]

    @classmethod
    def create(
        cls,
        positions: np.ndarray,
        inv_mass: np.ndarray,
        capacity: "int | None" = None,
        num_pickers: int = NUM_PICKERS,
    ) -> "ClothState":
        """Build a padded state from (N,3) positions + (N,) inverse masses."""
        positions = jnp.asarray(positions, jnp.float32)
        inv_mass = jnp.asarray(inv_mass, jnp.float32)
        n = positions.shape[0]
        cap = capacity or n
        assert cap >= n
        pad = cap - n
        positions = jnp.pad(positions, ((0, pad), (0, 0)))
        inv_mass = jnp.pad(inv_mass, (0, pad))
        active = jnp.arange(cap) < n
        return cls(
            positions=positions,
            velocities=jnp.zeros((cap, 3), jnp.float32),
            inv_mass=inv_mass,
            rest_inv_mass=inv_mass,
            active=active,
            picker_pos=jnp.full((num_pickers, 3), jnp.float32(-10.0)),
            picked_idx=jnp.full((num_pickers,), -1, jnp.int32),
            grasp_offset=jnp.zeros((num_pickers, 3), jnp.float32),
            time=jnp.float32(0.0),
            sweep_perm=jnp.arange(cap, dtype=jnp.int32),
            sweep_inv=jnp.arange(cap, dtype=jnp.int32),
            step_count=jnp.int32(0),
        )

    # -- pyflex-compatible accessors (reference: pyflex.cpp:326-922) --------

    def get_positions(self) -> jnp.ndarray:
        """(N*4,) flat [x y z invMass] like pyflex.get_positions()."""
        return jnp.concatenate(
            [self.positions, self.inv_mass[:, None]], axis=1
        ).reshape(-1)

    def set_positions(self, flat: jnp.ndarray) -> "ClothState":
        arr = jnp.asarray(flat, jnp.float32).reshape(-1, 4)
        return self.replace(positions=arr[:, :3], inv_mass=arr[:, 3])

    def get_velocities(self) -> jnp.ndarray:
        return self.velocities.reshape(-1)

    def set_velocities(self, flat: jnp.ndarray) -> "ClothState":
        return self.replace(velocities=jnp.asarray(flat, jnp.float32).reshape(-1, 3))
