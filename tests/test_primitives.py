"""Integration tests of the trajectory-program primitive interpreter."""

import jax
import jax.numpy as jnp
import numpy as np

from flingbot_tpu.engine import ClothState, SolverParams, build_grid_topology, step
from flingbot_tpu.engine.topology import grid_positions
from flingbot_tpu.env.coverage import get_current_covered_area
from flingbot_tpu.env.primitives import (
    PrimitiveConfig,
    execute_primitive,
)

DIM = 16
CFG = PrimitiveConfig(max_program_steps=2500)


def flat_state(dim=DIM, mass=0.3):
    pos = grid_positions(dim, dim, lower=(0.0, 0.005, 0.0))
    pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
    inv_mass = np.full(dim * dim, dim * dim / mass, np.float32)
    state = ClothState.create(pos, inv_mass)
    return state.replace(
        picker_pos=jnp.asarray([[0.5, 0.5, -0.5], [-0.5, 0.5, -0.5]]))


def topo(dim=DIM):
    return build_grid_topology(dim, dim, max_dimx=dim, max_dimy=dim)


class TestFling:
    def test_full_fling_episode(self):
        state = flat_state()
        t = topo()
        params = SolverParams()
        extent = (DIM - 1) * 0.00625 / 2
        # grasp two points near one cloth edge
        p1 = jnp.asarray([extent * 0.6, 0.02, -extent * 0.8])
        p2 = jnp.asarray([-extent * 0.6, 0.02, -extent * 0.8])
        area0 = float(get_current_covered_area(state.positions, state.active))
        new_state, terminated = execute_primitive(
            state, t, params, "fling", p1, p2,
            jnp.bool_(True), jnp.bool_(True),
            cfg=CFG, self_collision=False,
        )
        assert not bool(terminated)
        # pickers parked at the reset pose
        np.testing.assert_allclose(
            np.asarray(new_state.picker_pos),
            [[0.5, 0.5, -0.5], [-0.5, 0.5, -0.5]], atol=1e-3)
        # grasp released
        assert (np.asarray(new_state.picked_idx) == -1).all()
        # cloth back near the ground and still covering a sane area
        assert float(jnp.max(new_state.positions[:, 1])) < 0.2
        area1 = float(get_current_covered_area(
            new_state.positions, new_state.active))
        assert area1 > 0.4 * area0
        # cloth actually moved during the fling
        delta = np.linalg.norm(
            np.asarray(new_state.positions) - np.asarray(state.positions),
            axis=1).max()
        assert delta > 0.05

    def test_no_grasp_is_noop(self):
        state = flat_state()
        t = topo()
        params = SolverParams()
        p1 = jnp.asarray([0.02, 0.02, 0.0])
        p2 = jnp.asarray([-0.02, 0.02, 0.0])
        new_state, terminated = execute_primitive(
            state, t, params, "fling", p1, p2,
            jnp.bool_(False), jnp.bool_(False),
            cfg=CFG, self_collision=False,
        )
        # guard jump: no sim step ever ran
        np.testing.assert_allclose(
            np.asarray(new_state.positions), np.asarray(state.positions))
        assert not bool(terminated)

    def test_failed_grasp_terminates(self):
        state = flat_state()
        t = topo()
        params = SolverParams()
        # points far off the cloth: pick finds nothing, cloth never lifts
        p1 = jnp.asarray([0.6, 0.02, 0.6])
        p2 = jnp.asarray([0.5, 0.02, 0.6])
        new_state, terminated = execute_primitive(
            state, t, params, "fling", p1, p2,
            jnp.bool_(True), jnp.bool_(True),
            cfg=CFG, self_collision=False,
        )
        assert bool(terminated)
        # cloth essentially untouched
        delta = np.linalg.norm(
            np.asarray(new_state.positions) - np.asarray(state.positions),
            axis=1).max()
        assert delta < 0.05


class TestPickAndPlace:
    def test_place_moves_cloth(self):
        state = flat_state()
        t = topo()
        params = SolverParams()
        p1 = jnp.asarray([0.0, 0.02, 0.0])  # cloth center
        p2 = jnp.asarray([0.15, 0.02, 0.1])
        new_state, terminated = execute_primitive(
            state, t, params, "place", p1, p2,
            jnp.bool_(True), jnp.bool_(False),
            cfg=CFG, self_collision=False,
        )
        assert not bool(terminated)
        com0 = np.asarray(state.positions).mean(axis=0)
        com1 = np.asarray(new_state.positions).mean(axis=0)
        moved = np.linalg.norm((com1 - com0)[[0, 2]])
        assert moved > 0.03  # cloth displaced toward the place point

    def test_place_requires_p1_grasp(self):
        state = flat_state()
        t = topo()
        params = SolverParams()
        p1 = jnp.asarray([0.0, 0.02, 0.0])
        p2 = jnp.asarray([0.15, 0.02, 0.1])
        new_state, _ = execute_primitive(
            state, t, params, "place", p1, p2,
            jnp.bool_(False), jnp.bool_(True),
            cfg=CFG, self_collision=False,
        )
        np.testing.assert_allclose(
            np.asarray(new_state.positions), np.asarray(state.positions))


class TestVmap:
    def test_primitives_vmap_over_envs(self):
        """The Ray-pool replacement: a batch of envs executes flings in
        lockstep under vmap."""
        t = topo()
        params = SolverParams()
        base = flat_state()
        batch = jax.tree_util.tree_map(
            lambda x: jnp.stack([x, x]), base)
        extent = (DIM - 1) * 0.00625 / 2
        p1 = jnp.asarray([[extent * 0.5, 0.02, -extent * 0.5],
                          [extent * 0.4, 0.02, 0.0]])
        p2 = jnp.asarray([[-extent * 0.5, 0.02, -extent * 0.5],
                          [-extent * 0.4, 0.02, 0.0]])
        flags = jnp.asarray([True, True])

        fn = jax.vmap(
            lambda s, a, b, f: execute_primitive(
                s, t, params, "fling", a, b, f, f,
                cfg=PrimitiveConfig(max_program_steps=600),
                self_collision=False),
            in_axes=(0, 0, 0, 0),
        )
        out_states, term = fn(batch, p1, p2, flags)
        assert out_states.positions.shape[0] == 2
        assert term.shape == (2,)
        # both envs simulated: cloth moved in each
        for i in range(2):
            delta = np.abs(
                np.asarray(out_states.positions[i])
                - np.asarray(batch.positions[i])).max()
            assert delta > 1e-3
