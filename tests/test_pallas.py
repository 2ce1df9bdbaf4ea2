"""Pallas substep kernel vs the XLA stencil path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flingbot_tpu.engine import solver
from flingbot_tpu.engine.pallas_kernels import (
    PARAM_LEN,
    pack_params,
    pallas_substep,
)
from flingbot_tpu.engine.state import SolverParams
from flingbot_tpu.engine.topology import build_grid_topology, grid_positions

DIM = 16
SUB_DT = 0.01 / 4


def setup(dim=DIM, seed=0):
    rng = np.random.default_rng(seed)
    topo = build_grid_topology(dim, dim, max_dimx=dim, max_dimy=dim)
    params = SolverParams()
    pos = grid_positions(dim, dim, lower=(0.0, 0.1, 0.0)).reshape(dim, dim, 3)
    pos += rng.normal(0, 1e-3, pos.shape)
    P = jnp.asarray(np.moveaxis(pos, -1, 0))  # (3, H, W)
    V = jnp.asarray(rng.normal(0, 1e-2, (3, dim, dim)).astype(np.float32))
    w = jnp.full((dim, dim), dim * dim / 0.5, jnp.float32)
    return topo, params, P, V, w


def xla_substep(topo, params, P, V, w, iterations=30):
    valid = jnp.ones(P.shape[1:], bool)
    moving = valid & (w > 0)
    solve_fn = lambda Px: solver.solve_springs_grid(
        Px, w, valid, topo, params.relaxation_factor, "gs")
    return solver._substep(P, V, w, moving, params, SUB_DT, iterations,
                           solve_fn, None)


class TestPallasSubstep:
    def test_matches_xla_path(self):
        topo, params, P, V, w = setup()
        P1, V1 = xla_substep(topo, params, P, V, w)
        pvec = pack_params(params, topo).at[0].set(SUB_DT)
        P2, V2p = pallas_substep(
            pvec[None], P[None], V[None], w[None],
            iterations=30, interpret=True)
        np.testing.assert_allclose(
            np.asarray(P1), np.asarray(P2[0]), atol=2e-6)
        # kernel leaves finalize to the caller: V1 == (P2 - P) / dt
        V2 = np.asarray((P2[0] - P) / SUB_DT)
        np.testing.assert_allclose(np.asarray(V1), V2, atol=2e-3)

    def test_batched(self):
        topo, params, P, V, w = setup()
        _, _, P2s, V2s, _ = setup(seed=1)
        pvec = pack_params(params, topo).at[0].set(SUB_DT)
        Pb = jnp.stack([P, P2s])
        Vb = jnp.stack([V, V2s])
        wb = jnp.stack([w, w])
        pb = jnp.stack([pvec, pvec])
        Po, Vo = pallas_substep(pb, Pb, Vb, wb, iterations=5, interpret=True)
        # each env independently matches the XLA path
        for i, (Pi, Vi) in enumerate(((P, V), (P2s, V2s))):
            Pr, Vr = xla_substep(topo, params, Pi, Vi, w, iterations=5)
            np.testing.assert_allclose(
                np.asarray(Pr), np.asarray(Po[i]), atol=2e-6)

    def test_full_step_backend_parity(self):
        """solver.step(backend='pallas') == solver.step(backend='xla')."""
        from flingbot_tpu.engine.state import ClothState

        topo, params, _, _, _ = setup()
        pos = grid_positions(DIM, DIM, lower=(0.0, 0.2, 0.0))
        state = ClothState.create(
            pos, np.full(DIM * DIM, DIM * DIM / 0.5, np.float32))
        f_x = jax.jit(lambda s: solver.step(
            s, topo, params, self_collision=True))
        f_p = jax.jit(lambda s: solver.step(
            s, topo, params, self_collision=True, backend="pallas",
            pallas_interpret=True))
        sx, sp = state, state
        for _ in range(3):
            sx = f_x(sx)
            sp = f_p(sp)
        np.testing.assert_allclose(
            np.asarray(sx.positions), np.asarray(sp.positions), atol=1e-5)

    def test_vmap_over_pallas_step(self):
        """Primitives vmap the per-env step — the pallas path must batch."""
        from flingbot_tpu.engine.state import ClothState

        topo, params, _, _, _ = setup()
        pos = grid_positions(DIM, DIM, lower=(0.0, 0.2, 0.0))
        state = ClothState.create(
            pos, np.full(DIM * DIM, DIM * DIM / 0.5, np.float32))
        batch = jax.tree_util.tree_map(
            lambda x: jnp.stack([x, x]), state)
        f = jax.jit(jax.vmap(lambda s: solver.step(
            s, topo, params, self_collision=False, backend="pallas",
            pallas_interpret=True)))
        out = f(batch)
        ref = jax.jit(lambda s: solver.step(
            s, topo, params, self_collision=False))(state)
        np.testing.assert_allclose(
            np.asarray(out.positions[0]), np.asarray(ref.positions),
            atol=1e-5)

    def test_masked_inactive_region(self):
        # dims smaller than the lattice: padding must stay untouched
        dim, full = 10, DIM
        topo = build_grid_topology(dim, dim, max_dimx=full, max_dimy=full)
        params = SolverParams()
        P = jnp.zeros((3, full, full))
        P = P.at[1].set(0.1)
        V = jnp.zeros((3, full, full))
        w = jnp.full((full, full), 100.0)
        pvec = pack_params(params, topo).at[0].set(SUB_DT)
        Po, Vo = pallas_substep(
            pvec[None], P[None], V[None], w[None],
            iterations=3, interpret=True)
        # inactive corner (beyond dim) did not move
        assert float(Po[0, 1, full - 1, full - 1]) == pytest.approx(0.1)
        # active region fell
        assert float(Po[0, 1, 0, 0]) < 0.1
