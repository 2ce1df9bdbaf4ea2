"""Mesh-path solver parity with the grid path (VERDICT round-2 item 6):
Chebyshev acceleration on solve_springs_mesh and the sort-based contact
group with the rest-distance SelfCollideFilter (NvFlex.h:166)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flingbot_tpu.engine import collisions
from flingbot_tpu.engine.solver import step as solver_step
from flingbot_tpu.engine.state import ClothState, SolverParams
from flingbot_tpu.engine.topology import (
    grid_mesh_topology,
    grid_positions,
    grid_spring_edges,
)

DIM = 16


def make_mesh():
    topo = grid_mesh_topology(DIM, DIM)
    pos = grid_positions(DIM, DIM, lower=(0.0, 0.5, 0.0))
    n = DIM * DIM
    state = ClothState.create(pos, np.full(n, n / 0.5, np.float32))
    inv_mass = state.inv_mass.at[0].set(0.0)  # hang by one corner
    return topo, state.replace(inv_mass=inv_mass, rest_inv_mass=inv_mass)


def run_steps(state, topo, n, **kw):
    fn = jax.jit(lambda s: solver_step(s, topo, SolverParams(), **kw))
    for _ in range(n):
        state = fn(state)
    return state


def max_stretch(state):
    p = np.asarray(state.positions)
    edges, _, cls = grid_spring_edges(DIM, DIM)
    e = edges[cls == 0]
    return np.linalg.norm(p[e[:, 0]] - p[e[:, 1]], axis=1).max()


class TestMeshChebyshev:
    def test_chebyshev_stiffer_than_jacobi_and_distinct(self):
        topo, state = make_mesh()
        cheb = run_steps(state, topo, 40, self_collision=False,
                         spring_mode="chebyshev")
        jac = run_steps(state, topo, 40, self_collision=False,
                        spring_mode="jacobi")
        assert max_stretch(cheb) < max_stretch(jac) * 0.985
        s1 = run_steps(state, topo, 1, self_collision=False,
                       spring_mode="chebyshev")
        s2 = run_steps(state, topo, 1, self_collision=False,
                       spring_mode="jacobi")
        d = np.abs(np.asarray(s1.positions) - np.asarray(s2.positions)).max()
        assert d > 1e-7, "mesh chebyshev must not alias jacobi"

    def test_gs_maps_to_chebyshev(self):
        topo, state = make_mesh()
        a = run_steps(state, topo, 2, self_collision=False, spring_mode="gs")
        b = run_steps(state, topo, 2, self_collision=False,
                      spring_mode="chebyshev")
        np.testing.assert_allclose(
            np.asarray(a.positions), np.asarray(b.positions))

    def test_unknown_modes_raise(self):
        topo, state = make_mesh()
        with pytest.raises(ValueError):
            solver_step(state, topo, SolverParams(), spring_mode="nope",
                        self_collision=False)
        with pytest.raises(ValueError):
            solver_step(state, topo, SolverParams(), contact_mode="nope")


class TestMeshSortContacts:
    def test_rest_filter_suppresses_rest_pairs(self):
        """A flat mesh at rest spacing has every near pair under the radius
        in the rest pose -> zero contact impulses."""
        topo, state = make_mesh()
        P = state.positions.T
        out = collisions.contact_group(
            P, P, jnp.where(state.active, state.inv_mass, 0.0),
            state.active, SolverParams(), rest_dist=float(0.00625 * 1.8),
            rest_positions=topo.rest_positions.T, backend="xla")
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(P), atol=1e-7)

    def test_folded_mesh_separates(self):
        """Two mesh layers brought within the radius push apart under the
        sort contact group."""
        topo, state = make_mesh()
        pos = np.asarray(state.positions).copy()
        half = pos.copy()
        half[:, 1] += 0.002  # a second layer 2 mm above -> within radius
        # fold: move the top half rows onto the bottom half
        n = DIM * DIM
        pos[n // 2:] = half[: n - n // 2][: n - n // 2]
        P = jnp.asarray(pos).T
        w = jnp.where(state.active, state.inv_mass, 0.0)
        out = collisions.contact_group(
            P, P, w, state.active, SolverParams(),
            rest_dist=float(0.00625 * 1.8),
            rest_positions=topo.rest_positions.T, backend="xla",
            iterations=8)
        moved = np.abs(np.asarray(out) - pos.T).max()
        assert moved > 1e-5, "overlapping layers must separate"

    def test_mesh_step_with_sort_contacts_runs(self):
        topo, state = make_mesh()
        out = run_steps(state, topo, 3, self_collision=True,
                        contact_mode="sort", backend="xla")
        assert np.isfinite(np.asarray(out.positions)).all()

    def test_pallas_interpret_matches_xla(self):
        topo, state = make_mesh()
        pos = np.asarray(state.positions).copy()
        rng = np.random.default_rng(0)
        pos += rng.normal(0, 0.004, pos.shape).astype(np.float32)
        P = jnp.asarray(pos).T
        w = jnp.where(state.active, state.inv_mass, 0.0)
        kw = dict(rest_dist=float(0.00625 * 1.8),
                  rest_positions=topo.rest_positions.T, iterations=4)
        ox = collisions.contact_group(
            P, P, w, state.active, SolverParams(), backend="xla", **kw)
        op = collisions.contact_group(
            P, P, w, state.active, SolverParams(), backend="pallas",
            interpret=True, **kw)
        np.testing.assert_allclose(
            np.asarray(ox), np.asarray(op), atol=2e-5)


def test_vertex_centric_solve_matches_edge_form():
    """The gather-only vertex-centric spring solve (the TPU-native mesh
    formulation — no scatter; see solve_springs_mesh) is numerically
    IDENTICAL to the edge-list scatter-add formulation it replaced
    (measured bit-exact on this fixture)."""
    import numpy as np

    from flingbot_tpu.engine.solver import solve_springs_mesh
    from flingbot_tpu.engine.topology import build_mesh_topology

    rng = np.random.default_rng(0)
    nx, ny = 6, 5
    verts = np.stack(np.meshgrid(np.arange(nx), np.arange(ny),
                                 indexing="ij"), -1).reshape(-1, 2)
    pos = np.concatenate([verts * 0.01, np.zeros((len(verts), 1))],
                         1).astype(np.float32)[:, [0, 2, 1]]

    def idx(i, j):
        return i * ny + j

    stretch, shear, bend = [], [], []
    for i in range(nx):
        for j in range(ny):
            if i + 1 < nx:
                stretch.append((idx(i, j), idx(i + 1, j)))
            if j + 1 < ny:
                stretch.append((idx(i, j), idx(i, j + 1)))
            if i + 1 < nx and j + 1 < ny:
                shear += [(idx(i, j), idx(i + 1, j + 1)),
                          (idx(i + 1, j), idx(i, j + 1))]
            if i + 2 < nx:
                bend.append((idx(i, j), idx(i + 2, j)))
            if j + 2 < ny:
                bend.append((idx(i, j), idx(i, j + 2)))
    topo = build_mesh_topology(
        pos, np.array(stretch), np.array(bend), np.array(shear),
        np.array([(0, 1, ny)]), capacity=64, edge_capacity=256,
        tri_capacity=8, degree_capacity=16)

    N = 64
    P = jnp.asarray(pos.T + rng.normal(0, 2e-3, (3, len(pos))).astype(
        np.float32))
    P = jnp.pad(P, ((0, 0), (0, N - len(pos))))
    w = jnp.asarray(np.concatenate(
        [np.full(len(pos), 2.0, np.float32),
         np.zeros(N - len(pos), np.float32)]))

    def edge_form(P, w, topo, relax):  # the replaced formulation
        e0, e1 = topo.edges[:, 0], topo.edges[:, 1]
        pa, pb = P[:, e0], P[:, e1]
        wa, wb = w[e0], w[e1]
        d = pb - pa
        dist = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2 + 1e-9)
        C = dist - topo.rest
        wsum = wa + wb
        s = jnp.where(topo.edge_mask & (wsum > 0),
                      topo.stiffness * C / ((wsum + 1e-9) * dist), 0.0)
        acc = jnp.zeros_like(P).at[:, e0].add(
            (wa * s)[None] * d).at[:, e1].add((-(wb * s))[None] * d)
        return P + relax * acc / jnp.maximum(topo.degree, 1.0)[None]

    out_new = np.asarray(solve_springs_mesh(P, w, topo, 1.0))
    out_old = np.asarray(edge_form(P, w, topo, 1.0))
    np.testing.assert_allclose(out_new, out_old, atol=1e-6)
