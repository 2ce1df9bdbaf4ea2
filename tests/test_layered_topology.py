"""Layered-lattice shirt topology (LayeredGridTopology): the TPU-first
re-layout of 2-layer garment meshes onto one grid lattice so the spring
solve is stencil arithmetic instead of gathers (the measured mesh-path
bottleneck: 118 ms/env-step at batch 16 on v5e vs 0.47 ms grid).

The builder must be EXACT — same edges, same rest lengths, same per-vertex
degrees as the generic MeshTopology (reference edge derivation:
environment/tasks.py:39-102) — so the layered path is the same constraint
system in a different layout, not different physics."""

import numpy as np
import h5py
import jax
import pytest

from flingbot_tpu.engine.state import ClothState, SolverParams
from flingbot_tpu.engine.solver import step as solver_step
from flingbot_tpu.engine.topology import (
    build_layered_topology,
    build_mesh_topology,
    compute_layered_spec,
    load_cloth,
)
from flingbot_tpu.env.shirts import write_shirt_obj

SMALL_SHIRT = dict(body_w=0.15, body_h=0.20, sleeve_l=0.06, sleeve_h=0.06,
                   collar_w=0.06, spacing=0.0125)

SOLVER_KW = dict(substeps=4, iterations=16, spring_mode="chebyshev",
                 contact_mode="sort", contact_iterations=4, contact_every=2,
                 contact_window=12, backend="xla")


@pytest.fixture(scope="module")
def shirt_arrays(tmp_path_factory):
    d = tmp_path_factory.mktemp("shirt")
    path = str(d / "small_processed.obj")
    write_shirt_obj(path, **SMALL_SHIRT)
    verts, tri, se, be, she = load_cloth(path)
    return verts.astype(np.float32), tri, se, be, she


def _mesh_edge_set(se, be, she, verts, stiffness):
    out = {}
    for cls, edges in enumerate((se, be, she)):
        for a, b in np.sort(edges, axis=1):
            rest = float(np.linalg.norm(verts[a] - verts[b]))
            out[(int(a), int(b))] = (rest, float(stiffness[cls]))
    return out


class TestBuilderExactness:
    def test_edge_set_reconstruction(self, shirt_arrays):
        verts, tri, se, be, she = shirt_arrays
        stiffness = (0.8, 1.0, 0.9)
        spec = compute_layered_spec([dict(
            mesh_verts=verts.reshape(-1), mesh_stretch_edges=se,
            mesh_bend_edges=be, mesh_shear_edges=she, mesh_faces=tri)])
        assert spec is not None
        topo = build_layered_topology(verts, se, be, she, tri,
                                      stiffness, spec)
        # reconstruct the edge set from the per-class offset arrays
        H, W = spec.H, spec.W
        grid_src = np.asarray(topo.grid_src).reshape(H, W)
        stiff = np.asarray(topo.stiff)
        rest = np.asarray(topo.rest)
        recon = {}
        for k, (dy, dx) in enumerate(spec.offsets):
            ys, xs = np.nonzero(stiff[k] > 0)
            for y, x in zip(ys, xs):
                a = int(grid_src[y, x])
                b = int(grid_src[y + dy, x + dx])
                key = (min(a, b), max(a, b))
                assert key not in recon, "edge duplicated across classes"
                recon[key] = (float(rest[k, y, x]), float(stiff[k, y, x]))
        expect = _mesh_edge_set(se, be, she, verts, stiffness)
        assert set(recon) == set(expect)
        for key, (r, s) in expect.items():
            rr, ss = recon[key]
            assert abs(rr - r) < 1e-6 and abs(ss - s) < 1e-6

    def test_degree_matches_mesh(self, shirt_arrays):
        verts, tri, se, be, she = shirt_arrays
        spec = compute_layered_spec([dict(
            mesh_verts=verts.reshape(-1), mesh_stretch_edges=se,
            mesh_bend_edges=be, mesh_shear_edges=she, mesh_faces=tri)])
        topo = build_layered_topology(verts, se, be, she, tri,
                                      (0.8, 1.0, 0.9), spec)
        mesh_topo = build_mesh_topology(verts, se, be, she, tri,
                                        stiffness=(0.8, 1.0, 0.9))
        n = len(verts)
        slot = np.asarray(topo.mesh_slot)[:n]
        count = np.asarray(topo.count).reshape(-1)[slot]
        np.testing.assert_array_equal(
            count, np.asarray(mesh_topo.degree)[:n])

    def test_non_lattice_mesh_rejected(self):
        rng = np.random.default_rng(0)
        verts = rng.uniform(size=(20, 3)).astype(np.float32)
        edges = np.stack([np.arange(19), np.arange(1, 20)], axis=1)
        spec = compute_layered_spec([dict(
            mesh_verts=verts.reshape(-1), mesh_stretch_edges=edges,
            mesh_bend_edges=np.zeros((0, 2), np.int64),
            mesh_shear_edges=np.zeros((0, 2), np.int64),
            mesh_faces=np.zeros((0, 3), np.int64))])
        assert spec is None


class TestPhysicsParity:
    def test_drop_parity_with_mesh_path(self, shirt_arrays):
        """Same constraint system -> trajectories agree up to float
        summation order (which the contact sort reshuffles)."""
        verts, tri, se, be, she = shirt_arrays
        stiffness = (0.8, 1.0, 0.9)
        spec = compute_layered_spec([dict(
            mesh_verts=verts.reshape(-1), mesh_stretch_edges=se,
            mesh_bend_edges=be, mesh_shear_edges=she, mesh_faces=tri)])
        ltopo = build_layered_topology(verts, se, be, she, tri,
                                       stiffness, spec)
        mtopo = build_mesh_topology(verts, se, be, she, tri,
                                    stiffness=stiffness)
        n = len(verts)
        start = verts + np.array([0, 0.08, 0], np.float32)
        inv = np.full(n, n / 0.5, np.float32)
        sm = ClothState.create(start, inv)
        slot = np.asarray(ltopo.mesh_slot)[:n]
        hw = spec.H * spec.W
        pos = np.zeros((hw, 3), np.float32)
        pos[slot] = start
        invl = np.zeros(hw, np.float32)
        invl[slot] = inv
        sl = ClothState.create(pos, invl, capacity=hw).replace(
            active=ltopo.active.reshape(-1))

        params = SolverParams()
        fm = jax.jit(lambda s: solver_step(s, mtopo, params, **SOLVER_KW))
        fl = jax.jit(lambda s: solver_step(s, ltopo, params, **SOLVER_KW))
        for _ in range(12):
            sm = fm(sm)
            sl = fl(sl)
        pm = np.asarray(sm.positions)[:n]
        pl = np.asarray(sl.positions)[slot]
        d = np.linalg.norm(pm - pl, axis=1)
        # float-ordering divergence only; 12 frames of a drop stay tight
        assert d.max() < 0.01, d.max()
        assert np.isfinite(pl).all()


class TestEnvIntegration:
    def test_batch_env_layered_episode(self, tmp_path):
        from flingbot_tpu.env.batch_env import BatchSimEnv
        from flingbot_tpu.env.tasks import (
            TaskLoader, detect_layered_spec, generate_randomization,
            write_task)

        d = tmp_path / "objs"
        d.mkdir()
        write_shirt_obj(str(d / "small_processed.obj"), **SMALL_SHIRT)
        task_path = str(tmp_path / "shirt_tasks.hdf5")
        rng = np.random.default_rng(0)
        task = None
        while task is None:
            task = generate_randomization(
                rng, cloth_type="mesh", cloth_mesh_path=str(d),
                task_difficulty="hard", mesh_caps=(1024, 16384, 2048))
        write_task(task_path, task)

        spec = detect_layered_spec(task_path)
        assert spec is not None
        loader = TaskLoader(task_path)
        replay = str(tmp_path / "replay.hdf5")
        env = BatchSimEnv(
            get_task_fn=loader.get_next_task,
            num_envs=2,
            replay_buffer_path=replay,
            obs_dim=64,
            num_rotations=2,
            scale_factors=[1.0],
            action_primitives=["fling"],
            episode_length=1,
            render_dim=128,
            layered_spec=spec,
            exec_mode="chunked",
            chunk_steps=40,
        )
        obs = env.reset()
        assert np.asarray(obs).shape == (2, 2, 4, 64, 64)
        assert (env.init_coverage > 0).all()
        rng = np.random.default_rng(0)
        vm = rng.uniform(size=(2, 1, 2, 64, 64)).astype(np.float32)
        obs2 = env.step(vm)
        assert np.asarray(obs2).shape == (2, 2, 4, 64, 64)
        assert env.episodes_done == 2
        with h5py.File(replay, "r") as f:
            assert len(f) == 2
            for k in f:
                assert f[k].attrs["task_difficulty"] == "shirt"
