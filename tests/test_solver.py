"""Unit tests for the XPBD cloth solver (the capability the reference could
never test: its solver was a closed-source binary)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flingbot_tpu.engine import (
    ClothState,
    SolverParams,
    build_grid_topology,
    step,
)
from flingbot_tpu.engine.solver import shift2d
from flingbot_tpu.engine.topology import (
    grid_mesh_topology,
    grid_positions,
    grid_spring_edges,
)
from flingbot_tpu.engine import picker as picker_mod

DIM = 16


def make_grid_state(dim=DIM, height=0.3, mass=0.5):
    pos = grid_positions(dim, dim, lower=(0.0, height, 0.0))
    pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
    inv_mass = np.full(dim * dim, dim * dim / mass, np.float32)
    return ClothState.create(pos, inv_mass)


def make_grid_topo(dim=DIM):
    return build_grid_topology(dim, dim, max_dimx=dim, max_dimy=dim)


@pytest.fixture(scope="module")
def grid_setup():
    return make_grid_state(), make_grid_topo()


def run_steps(state, topo, n, **kw):
    params = kw.pop("params", SolverParams())
    fn = jax.jit(
        lambda s: step(s, topo, params, **kw)
    )
    for _ in range(n):
        state = fn(state)
    return state


class TestShift2d:
    def test_matches_numpy(self):
        a = jnp.arange(20.0).reshape(4, 5)
        out = shift2d(a, 1, 0, fill=-1.0)
        ref = np.full((4, 5), -1.0)
        ref[:3] = np.asarray(a)[1:]
        np.testing.assert_allclose(out, ref)

        out = shift2d(a, 0, -2, fill=0.0)
        ref = np.zeros((4, 5))
        ref[:, 2:] = np.asarray(a)[:, :-2]
        np.testing.assert_allclose(out, ref)

    def test_leading_component_axis(self):
        # shift acts on the LAST two axes; leading (component) axes ride
        a = jnp.arange(24.0).reshape(2, 3, 4)
        out = shift2d(a, 1, 0)
        assert out.shape == (2, 3, 4)
        ref = np.zeros((2, 3, 4))
        ref[:, :2] = np.asarray(a)[:, 1:]
        np.testing.assert_allclose(out, ref)


class TestFreeFall:
    def test_falls_then_rests_on_plane(self, grid_setup):
        state, topo = grid_setup
        params = SolverParams()
        s = run_steps(state, topo, 30, params=params, self_collision=False)
        # after 0.3 s of fall from 0.3 m the cloth has hit the floor
        ys = np.asarray(s.positions[:, 1])
        assert ys.max() < 0.05
        assert ys.min() > -0.005  # never tunnels through the plane
        s = run_steps(s, topo, 60, params=params, self_collision=False)
        v = np.abs(np.asarray(s.velocities)).max()
        assert v < 2e-2  # settled (wait_until_stable tolerance, 1e-2-ish)

    def test_flat_rest_keeps_area(self, grid_setup):
        state, topo = grid_setup
        s = run_steps(state, topo, 60, self_collision=False)
        p = np.asarray(s.positions)
        ext_x = p[:, 0].max() - p[:, 0].min()
        expect = (DIM - 1) * 0.00625
        assert abs(ext_x - expect) / expect < 0.08  # little in-plane shrink


class TestHangingCloth:
    def test_hangs_from_pinned_corner(self):
        state = make_grid_state(height=0.5)
        topo = make_grid_topo()
        inv_mass = state.inv_mass.at[0].set(0.0)
        state = state.replace(inv_mass=inv_mass, rest_inv_mass=inv_mass)
        s = run_steps(state, topo, 100, self_collision=False)
        p = np.asarray(s.positions)
        # pinned corner never moved
        np.testing.assert_allclose(p[0], np.asarray(state.positions)[0], atol=1e-5)
        # opposite corner fell below the pin
        assert p[-1, 1] < p[0, 1] - 0.05
        # max stretch of any stretch spring stays bounded (stiff cloth)
        edges, rest_k, cls = grid_spring_edges(DIM, DIM)
        stretch = edges[cls == 0]
        lens = np.linalg.norm(p[stretch[:, 0]] - p[stretch[:, 1]], axis=1)
        assert lens.max() < 0.00625 * 1.35


class TestGridVsMeshPath:
    def test_jacobi_paths_agree(self):
        """Stencil Jacobi (grid path) must reproduce the generic
        gather/segment-sum path on identical topology."""
        state = make_grid_state(height=0.2)
        topo_g = make_grid_topo()
        topo_m = grid_mesh_topology(DIM, DIM)
        s_g = run_steps(
            state, topo_g, 5, self_collision=False, spring_mode="jacobi"
        )
        s_m = run_steps(state, topo_m, 5, self_collision=False)
        np.testing.assert_allclose(
            np.asarray(s_g.positions), np.asarray(s_m.positions),
            atol=2e-5,
        )

    def test_chebyshev_matches_gs_convergence(self):
        """Chebyshev-accelerated Jacobi (Wang 2015) keeps FleX's
        Jacobi+local-relaxation semantics but converges like GS."""
        state = make_grid_state(height=0.5)
        topo = make_grid_topo()
        inv_mass = state.inv_mass.at[0].set(0.0)
        state = state.replace(inv_mass=inv_mass, rest_inv_mass=inv_mass)

        def max_stretch(mode):
            s = run_steps(state, topo, 60, self_collision=False,
                          spring_mode=mode)
            p = np.asarray(s.positions)
            edges, _, cls = grid_spring_edges(DIM, DIM)
            e = edges[cls == 0]
            return np.linalg.norm(p[e[:, 0]] - p[e[:, 1]], axis=1).max()

        cheb = max_stretch("chebyshev")
        gs = max_stretch("gs")
        jac = max_stretch("jacobi")
        assert cheb < jac * 0.9  # dramatically stiffer than plain Jacobi
        assert cheb < gs * 1.05  # and on par with Gauss-Seidel

        # the modes are genuinely distinct solvers, not aliases: one step
        # from the same state must produce different (but close) positions
        s1 = run_steps(state, topo, 1, self_collision=False,
                       spring_mode="chebyshev")
        s2 = run_steps(state, topo, 1, self_collision=False,
                       spring_mode="gs")
        s3 = run_steps(state, topo, 1, self_collision=False,
                       spring_mode="jacobi")
        d_cheb_gs = np.abs(
            np.asarray(s1.positions) - np.asarray(s2.positions)).max()
        d_cheb_jac = np.abs(
            np.asarray(s1.positions) - np.asarray(s3.positions)).max()
        assert d_cheb_gs > 1e-7, "chebyshev must not alias gs"
        assert d_cheb_jac > 1e-7, "chebyshev must not alias jacobi"

    def test_gs_is_stiffer_than_jacobi(self):
        state = make_grid_state(height=0.5)
        topo = make_grid_topo()
        inv_mass = state.inv_mass.at[0].set(0.0)
        state = state.replace(inv_mass=inv_mass, rest_inv_mass=inv_mass)

        def max_stretch(s):
            p = np.asarray(s.positions)
            edges, _, cls = grid_spring_edges(DIM, DIM)
            e = edges[cls == 0]
            return np.linalg.norm(p[e[:, 0]] - p[e[:, 1]], axis=1).max()

        s_gs = run_steps(state, topo, 40, self_collision=False, spring_mode="gs")
        s_j = run_steps(state, topo, 40, self_collision=False,
                        spring_mode="jacobi")
        assert max_stretch(s_gs) <= max_stretch(s_j) + 1e-6


class TestMomentum:
    def test_no_spurious_horizontal_drift(self, grid_setup):
        state, topo = grid_setup
        s = run_steps(state, topo, 50, self_collision=False)
        com = np.asarray(s.positions).mean(axis=0)
        assert abs(com[0]) < 1e-3 and abs(com[2]) < 1e-3


class TestPicker:
    def test_grasp_move_release(self):
        state = make_grid_state(height=0.0)
        topo = make_grid_topo()
        params = SolverParams()
        # settle briefly
        state = run_steps(state, topo, 5, self_collision=False)
        # park picker 0 right above particle 0
        target = np.asarray(state.positions[0])
        pick_pos = jnp.array([
            [target[0], target[1] + 0.01, target[2]],
            [1.0, 1.0, 1.0],
        ])
        state = picker_mod.set_picker_positions(state, pick_pos)
        action = jnp.array([[0.0, 0.0, 0.0, 1.0], [0.0, 0.0, 0.0, 0.0]])
        state = picker_mod.picker_step(state, action)
        assert int(state.picked_idx[0]) == 0
        assert float(state.inv_mass[0]) == 0.0

        # lift: particle follows picker
        lift = jnp.array([[0.0, 0.002, 0.0, 1.0], [0.0, 0.0, 0.0, 0.0]])
        fn = jax.jit(lambda s: step(
            picker_mod.picker_step(s, lift), topo, params,
            self_collision=False))
        for _ in range(100):
            state = fn(state)
        assert float(state.positions[0, 1]) > 0.15
        # cloth got dragged up with it
        assert float(jnp.max(state.positions[:, 1])) > 0.15

        # release
        rel = jnp.array([[0.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0]])
        state = picker_mod.picker_step(state, rel)
        assert int(state.picked_idx[0]) == -1
        assert float(state.inv_mass[0]) > 0.0

    def test_two_pickers_never_share_a_particle(self):
        state = make_grid_state(height=0.0)
        topo = make_grid_topo()
        p0 = np.asarray(state.positions[0])
        both = jnp.array([
            [p0[0], p0[1] + 0.01, p0[2]],
            [p0[0], p0[1] + 0.01, p0[2]],
        ])
        state = picker_mod.set_picker_positions(state, both)
        action = jnp.array([[0.0, 0.0, 0.0, 1.0], [0.0, 0.0, 0.0, 1.0]])
        state = picker_mod.picker_step(state, action)
        a, b = int(state.picked_idx[0]), int(state.picked_idx[1])
        assert a >= 0 and b >= 0 and a != b


class TestSelfCollision:
    def test_contacts_separate_overlapping_layers(self):
        # two flat layers closer than the interaction radius
        dim = 8
        top = grid_positions(dim, dim, lower=(0.0, 0.012, 0.0))
        bottom = grid_positions(dim, dim, lower=(0.0, 0.006, 0.0))
        # single mesh topology of two disconnected grids
        from flingbot_tpu.engine.topology import build_mesh_topology
        edges, rest_k, cls = grid_spring_edges(dim, dim)
        n = dim * dim
        all_pos = np.concatenate([bottom, top])
        # rest poses far apart so the SelfCollideFilter keeps the pair live
        rest_pose = np.concatenate(
            [bottom, top + np.array([10.0, 0.0, 0.0], np.float32)])
        e2 = np.concatenate([edges, edges + n])
        c2 = np.concatenate([cls, cls])
        topo = build_mesh_topology(
            rest_pose,
            e2[c2 == 0], e2[c2 == 1], e2[c2 == 2],
            np.zeros((0, 3), np.int64),
        )
        inv_mass = np.full(2 * n, 2 * n / 0.5, np.float32)
        state = ClothState.create(all_pos, inv_mass)
        s = run_steps(state, topo, 10, self_collision=True)
        p = np.asarray(s.positions)
        top_y = p[n:, 1]
        bot_y = p[:n, 1]
        # layers must not have merged into one plane
        assert np.median(top_y) - np.median(bot_y) > 0.004


class TestLargeRect:
    """Large-rect eval support (reference README.md:136-141: cloths >= 112
    particles/edge): the solver + contact group must hold up at a 128
    lattice cap."""

    def test_step_at_128_cap(self):
        dim, cap = 120, 128
        pos = grid_positions(dim, dim, lower=(0.0, 0.05, 0.0))
        pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
        n = dim * dim
        state = ClothState.create(
            pos, np.full(n, n / 1.0, np.float32), capacity=cap * cap)
        topo = build_grid_topology(dim, dim, max_dimx=cap, max_dimy=cap)
        fn = jax.jit(lambda s: step(
            s, topo, SolverParams(), substeps=2, iterations=8,
            self_collision=True, spring_mode="chebyshev",
            contact_mode="sort", contact_every=2))
        s = state
        for _ in range(3):
            s = fn(s)
        p = np.asarray(s.positions)[np.asarray(s.active)]
        assert np.isfinite(p).all()
        assert p[:, 1].min() > -1e-3  # fell toward the plane, no blowup

    def test_pallas_interpret_at_128_cap(self):
        dim, cap = 116, 128
        pos = grid_positions(dim, dim, lower=(0.0, 0.02, 0.0))
        n = dim * dim
        state = ClothState.create(
            pos, np.full(n, n / 1.0, np.float32), capacity=cap * cap)
        topo = build_grid_topology(dim, dim, max_dimx=cap, max_dimy=cap)
        s = jax.jit(lambda s: step(
            s, topo, SolverParams(), substeps=1, iterations=2,
            self_collision=True, backend="pallas",
            pallas_interpret=True, contact_every=1))(state)
        assert np.isfinite(np.asarray(s.positions)).all()


def test_chebyshev_rho_is_a_live_runtime_knob():
    """SolverParams.chebyshev_rho changes the accelerated solve (so rho
    sweeps work) without retracing: both rho values run through ONE
    jitted function (rho is a traced leaf, not a static)."""
    import jax

    from flingbot_tpu.engine.state import ClothState, SolverParams
    from flingbot_tpu.engine.topology import (
        build_grid_topology, grid_positions)

    dim = 12
    topo = build_grid_topology(dim, dim, max_dimx=dim, max_dimy=dim)
    pos = grid_positions(dim, dim, lower=(0.0, 0.5, 0.0))
    n = dim * dim
    st = ClothState.create(pos, np.full(n, n / 0.5, np.float32))
    im = st.inv_mass.at[0].set(0.0)
    st = st.replace(inv_mass=im, rest_inv_mass=im)

    fn = jax.jit(lambda s, p: step(
        s, topo, p, self_collision=False, spring_mode="chebyshev",
        iterations=12))
    outs = {}
    for rho in (0.5, 0.992):
        s = st
        p = SolverParams(chebyshev_rho=jnp.float32(rho))
        for _ in range(10):
            s = fn(s, p)
        outs[rho] = np.asarray(s.positions)
    assert fn._cache_size() == 1  # one trace for both rho values
    assert np.abs(outs[0.5] - outs[0.992]).max() > 1e-5


class TestPickerFriction:
    """Picker-sphere Coulomb friction (VERDICT r3 item 9).

    FleX gives the picker sphere SHAPES dynamicFriction=0.75
    (softgym_cloth.h:164); production here runs push-out only
    (SolverParams.picker_friction = 0, the documented deviation in
    solve_picker_spheres — A/B numbers in its docstring)."""

    def _setup(self):
        from flingbot_tpu.engine.solver import solve_picker_spheres

        # particle 0 penetrates the sphere at (0,0,0) ABOVE center (contact
        # normal +y) and slid in +x this substep — a purely TANGENTIAL
        # slip; particle 1 is far away, also sliding
        P = jnp.asarray([[0.010, 0.5], [0.010, 0.0], [0.0, 0.0]])  # (3, 2)
        prev = jnp.asarray([[0.000, 0.49], [0.010, 0.0], [0.0, 0.0]])
        pickers = jnp.zeros((2, 3), jnp.float32)  # both spheres at origin
        moving = jnp.asarray([True, True])
        return solve_picker_spheres, P, prev, pickers, moving

    def test_mu_zero_matches_push_only(self):
        solve, P, prev, pickers, moving = self._setup()
        params = SolverParams()  # picker_friction defaults to 0
        out_no_prev = solve(P, pickers, 0.02, params, moving)
        out_prev = solve(P, pickers, 0.02, params, moving, prev=prev)
        np.testing.assert_array_equal(
            np.asarray(out_no_prev), np.asarray(out_prev))

    def test_friction_removes_tangential_slip(self):
        solve, P, prev, pickers, moving = self._setup()
        base = solve(P, pickers, 0.02, SolverParams(), moving, prev=prev)
        rubbed = solve(
            P, pickers, 0.02,
            SolverParams(picker_friction=jnp.float32(0.75)), moving,
            prev=prev)
        base, rubbed = np.asarray(base), np.asarray(rubbed)
        # contacted particle: tangential (x) progress reduced, not reversed
        assert rubbed[0, 0] < base[0, 0]
        assert rubbed[0, 0] > prev[0, 0]
        # normal push-out identical (friction is tangential-only)
        # direction of push is radial from the sphere center; particle 0
        # moves along +x so its push is +x — compare the far particle
        np.testing.assert_allclose(rubbed[:, 1], base[:, 1])
