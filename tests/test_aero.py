"""Aerodynamics (drag/lift/wind) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from flingbot_tpu.engine import ClothState, SolverParams, build_grid_topology, step
from flingbot_tpu.engine.topology import grid_positions

DIM = 12


def falling_state(height=0.5):
    pos = grid_positions(DIM, DIM, lower=(0.0, height, 0.0))
    pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
    inv_mass = np.full(DIM * DIM, DIM * DIM / 0.3, np.float32)
    return ClothState.create(pos, inv_mass)


def run(state, params, n, aero):
    topo = build_grid_topology(DIM, DIM, max_dimx=DIM, max_dimy=DIM)
    fn = jax.jit(lambda s: step(
        s, topo, params, self_collision=False, aero=aero))
    for _ in range(n):
        state = fn(state)
    return state


class TestAero:
    def test_drag_slows_falling_cloth(self):
        state = falling_state()
        no_aero = run(state, SolverParams(), 20, aero=False)
        dragged = run(
            state, SolverParams(drag=jnp.float32(20.0)), 20, aero=True)
        # horizontal cloth falling face-down: drag opposes the fall
        assert float(dragged.positions[:, 1].mean()) > \
            float(no_aero.positions[:, 1].mean()) + 0.01

    def test_wind_pushes_cloth(self):
        state = falling_state(height=0.3)
        params = SolverParams(
            drag=jnp.float32(10.0),
            wind=jnp.asarray([0.0, 2.0, 0.0], jnp.float32))
        # upward wind with drag slows the fall vs still air
        windy = run(state, params, 15, aero=True)
        still = run(state, SolverParams(drag=jnp.float32(10.0)), 15,
                    aero=True)
        assert float(windy.positions[:, 1].mean()) > \
            float(still.positions[:, 1].mean())

    def test_zero_params_noop(self):
        state = falling_state()
        a = run(state, SolverParams(), 5, aero=True)
        b = run(state, SolverParams(), 5, aero=False)
        np.testing.assert_allclose(
            np.asarray(a.positions), np.asarray(b.positions), atol=1e-6)


class TestMeshAero:
    """Mesh-path aero: dynamic-triangle drag/lift (NvFlex.h:120-122) via
    face-normal accumulation (aero.mesh_normals)."""

    def _mesh(self, height=0.5):
        from flingbot_tpu.engine.topology import grid_mesh_topology

        topo = grid_mesh_topology(DIM, DIM)
        pos = grid_positions(DIM, DIM, lower=(0.0, height, 0.0))
        pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
        inv_mass = np.full(DIM * DIM, DIM * DIM / 0.3, np.float32)
        return topo, ClothState.create(pos, inv_mass)

    def test_mesh_normals_flat_sheet_point_up(self):
        from flingbot_tpu.engine.aero import mesh_normals

        topo, state = self._mesh()
        n = np.asarray(mesh_normals(
            jnp.asarray(state.positions.T), topo.triangles, topo.tri_mask,
            state.active))
        ny = np.abs(n[1][np.asarray(state.active)])
        assert (ny > 0.99).all()

    def test_mesh_drag_slows_falling_cloth(self):
        topo, state = self._mesh()

        def run(params, aero):
            fn = jax.jit(lambda s: step(
                s, topo, params, self_collision=False, aero=aero))
            s = state
            for _ in range(20):
                s = fn(s)
            return s

        no_aero = run(SolverParams(), aero=False)
        dragged = run(SolverParams(drag=jnp.float32(20.0)), aero=True)
        assert float(dragged.positions[:, 1].mean()) > \
            float(no_aero.positions[:, 1].mean()) + 0.01

    def test_mesh_normals_cancel_at_folds(self):
        """A cloth folded flat onto itself: adjacent faces' normals point
        opposite ways, so the NET per-vertex normal must go to ~0 (the
        per-triangle NvFlex formulation yields ~zero net force there) —
        NOT get renormalized into a unit vector of noise direction."""
        from flingbot_tpu.engine.aero import mesh_normals

        # two coincident-plane triangles over the same 4 grid points with
        # opposite windings = a 180-degree fold
        P = jnp.asarray(np.array(
            [[0, 0, 0], [1, 0, 0], [0, 0, 1], [1, 0, 1]], np.float32).T)
        tris = jnp.asarray(np.array(
            [[0, 1, 2], [1, 0, 3]], np.int32))  # opposite orientations
        mask = jnp.ones(2, bool)
        active = jnp.ones(4, bool)
        n = np.asarray(mesh_normals(P, tris, mask, active))
        # shared vertices 0 and 1 see both faces -> cancelled
        assert np.linalg.norm(n[:, 0]) < 0.05
        assert np.linalg.norm(n[:, 1]) < 0.05
        # unshared vertices see one face -> coherent unit normal
        assert abs(np.linalg.norm(n[:, 2]) - 1.0) < 1e-4
        assert abs(np.linalg.norm(n[:, 3]) - 1.0) < 1e-4
