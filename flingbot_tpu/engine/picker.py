"""Gripper ("picker") kinematics as pure functions over ClothState.

Reimplements the SoftGym Picker contract (reference:
environment/flex_utils.py:35-205): a picker is a kinematic sphere; when its
pick flag is raised it grasps the nearest particle within
threshold + picker_radius + particle_radius, zeroes that particle's inverse
mass, and co-moves it; lowering the flag restores the saved inverse mass.
PickerPickPlace.step (flex_utils.py:223-252) moves toward a target in
per-sim-step increments — that interpolation lives in env/primitives.py; this
module is the single-sim-step state transition.
"""

from __future__ import annotations

import jax.numpy as jnp

from flingbot_tpu.engine.state import ClothState

DEFAULT_PICKER_RADIUS = 0.02  # SimEnv passes picker_radius=grasp_height=0.02
PICK_THRESHOLD = 0.005  # flex_utils.py:39 picker_threshold


def picker_step(
    state: ClothState,
    action: jnp.ndarray,
    *,
    picker_radius: float = DEFAULT_PICKER_RADIUS,
    particle_radius: float = 0.00625,
    dt: float = 0.01,
) -> ClothState:
    """Apply one picker action [dx, dy, dz, pick_flag] per picker.

    Mirrors Picker.step (flex_utils.py:121-205): unpick -> move -> maybe
    grasp nearest -> co-move grasped particle (inv mass pinned to 0).  The
    grasped particle also inherits the picker velocity so that a release
    mid-motion hands momentum to the solver."""
    action = action.reshape(-1, 4)
    num_pickers = state.picker_pos.shape[0]
    n = state.num_particles

    positions = state.positions
    velocities = state.velocities
    inv_mass = state.inv_mass
    picker_pos = state.picker_pos
    picked_idx = state.picked_idx

    grasp_range = PICK_THRESHOLD + picker_radius + particle_radius

    for i in range(num_pickers):
        delta = action[i, :3]
        flag = action[i, 3] > 0.5
        cur_idx = picked_idx[i]
        has = cur_idx >= 0

        # 1. unpick: restore saved inverse mass (flex_utils.py:135-140)
        release = (~flag) & has
        restore_slot = jnp.where(release, cur_idx, n)  # n -> dropped
        inv_mass = inv_mass.at[restore_slot].set(
            state.rest_inv_mass[jnp.clip(cur_idx, 0, n - 1)], mode="drop"
        )
        cur_idx = jnp.where(release, -1, cur_idx)
        has = cur_idx >= 0

        # 2. move the picker
        new_pos = picker_pos[i] + delta
        picker_pos = picker_pos.at[i].set(new_pos)

        # 3. grasp nearest free particle in range (flex_utils.py:143-166)
        d = positions - picker_pos[i]
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1))
        taken = jnp.zeros(n, bool)
        for j in range(num_pickers):
            if j != i:
                oid = picked_idx[j]
                taken = taken | (
                    (jnp.arange(n) == oid) & (oid >= 0)
                )
        eligible = state.active & ~taken & (dist <= grasp_range)
        dist_masked = jnp.where(eligible, dist, jnp.inf)
        nearest = jnp.argmin(dist_masked)
        can_pick = flag & (~has) & jnp.isfinite(dist_masked[nearest])
        cur_idx = jnp.where(can_pick, nearest, cur_idx)
        has = cur_idx >= 0

        # 4. co-move the grasped particle, pin its inverse mass to 0
        move = flag & has
        slot = jnp.where(move, cur_idx, n)
        tgt = positions[jnp.clip(cur_idx, 0, n - 1)] + delta
        positions = positions.at[slot].set(tgt, mode="drop")
        inv_mass = inv_mass.at[slot].set(0.0, mode="drop")
        velocities = velocities.at[slot].set(delta / dt, mode="drop")

        picked_idx = picked_idx.at[i].set(cur_idx)

    return state.replace(
        positions=positions,
        velocities=velocities,
        inv_mass=inv_mass,
        picker_pos=picker_pos,
        picked_idx=picked_idx,
    )


def set_picker_positions(state: ClothState, pos: jnp.ndarray) -> ClothState:
    """Teleport pickers without touching grasp state (Picker.reset analog,
    flex_utils.py:74-101)."""
    return state.replace(picker_pos=jnp.asarray(pos, jnp.float32).reshape(-1, 3))


def release_all(state: ClothState) -> ClothState:
    """Drop every grasp and restore saved inverse masses."""
    n = state.num_particles
    inv_mass = state.inv_mass
    for i in range(state.picked_idx.shape[0]):
        idx = state.picked_idx[i]
        slot = jnp.where(idx >= 0, idx, n)
        inv_mass = inv_mass.at[slot].set(
            state.rest_inv_mass[jnp.clip(idx, 0, n - 1)], mode="drop"
        )
    return state.replace(
        inv_mass=inv_mass,
        picked_idx=jnp.full_like(state.picked_idx, -1),
    )
