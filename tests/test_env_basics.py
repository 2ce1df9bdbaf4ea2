"""Tests for coverage, scene/task IO, camera and renderer."""

import numpy as np
import jax.numpy as jnp
import pytest

from flingbot_tpu.engine.topology import grid_positions
from flingbot_tpu.env.coverage import get_current_covered_area
from flingbot_tpu.env import scene as scene_mod
from flingbot_tpu.env.tasks import Task, TaskLoader, write_task
from flingbot_tpu.render import camera as cam
from flingbot_tpu.render.rasterizer import render_rgbd, cloth_mask_from_depth


def reference_covered_area(pos4, radius=0.00625):
    """Oracle: the reference's covered-area algorithm
    (environment/flex_utils.py:358-395), reimplemented densely."""
    pos = pos4.reshape(-1, 4)[:, [0, 2]]
    mn = pos.min(axis=0)
    mx = pos.max(axis=0)
    span = (mx - mn) / 100.0
    off = pos - mn
    lo = np.maximum(np.round((off - radius) / span).astype(int), 0)
    hi = np.minimum(np.round((off + radius) / span).astype(int), 100)
    grid = np.zeros((101, 101))
    for (lx, lz), (hx, hz) in zip(lo, hi):
        grid[lx:hx + 1, lz:hz + 1] = 1
    grid = grid.reshape(-1)[: 10000]
    return grid.sum() * span[0] * span[1]


class TestCoverage:
    def test_flat_cloth_area(self):
        dim = 64
        pos = grid_positions(dim, dim)
        area = float(get_current_covered_area(jnp.asarray(pos)))
        expect = (dim * 0.00625) ** 2
        assert abs(area - expect) / expect < 0.15

    def test_matches_reference_algorithm(self):
        rng = np.random.default_rng(0)
        pos = rng.uniform(-0.2, 0.2, (500, 3)).astype(np.float32)
        pos4 = np.concatenate([pos, np.ones((500, 1), np.float32)], axis=1)
        ours = float(get_current_covered_area(jnp.asarray(pos)))
        ref = reference_covered_area(pos4.reshape(-1))
        assert abs(ours - ref) / ref < 0.05

    def test_padding_mask(self):
        pos = grid_positions(16, 16)
        padded = np.concatenate([pos, np.full((50, 3), 7.0, np.float32)])
        active = np.arange(len(padded)) < len(pos)
        a1 = float(get_current_covered_area(jnp.asarray(pos)))
        a2 = float(get_current_covered_area(
            jnp.asarray(padded), jnp.asarray(active)))
        assert abs(a1 - a2) / a1 < 1e-3


class TestTaskIO:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "tasks.hdf5")
        n = 16 * 16
        pos4 = np.random.rand(n * 4).astype(np.float32)
        task_dict = {
            "particle_pos": pos4,
            "particle_vel": np.zeros(n * 3, np.float32),
            "initial_coverage": 0.01,
            "shape_pos": np.zeros(28, np.float32),
            "phase": np.zeros(n, np.int32),
            "flatten_area": 0.04,
            "flip_mesh": 0,
            "cloth_size": np.array([16, 16]),
            "cloth_stiff": np.array([0.9, 0.9, 0.9]),
            "cloth_mass": 0.5,
            "task_difficulty": "hard",
            "mesh_verts": np.array([]),
            "mesh_stretch_edges": np.array([]),
            "mesh_bend_edges": np.array([]),
            "mesh_shear_edges": np.array([]),
            "mesh_faces": np.array([]),
        }
        write_task(path, task_dict)
        loader = TaskLoader(path)
        task = loader.get_next_task()
        assert task.task_difficulty == "hard"
        np.testing.assert_allclose(task.particle_pos, pos4)
        assert task.flatten_area == pytest.approx(0.04)
        # repeat=True cycles
        t2 = loader.get_next_task()
        assert t2.name == task.name

    def test_set_scene_restores_state(self):
        dim = 16
        pos = grid_positions(dim, dim, lower=(0, 0.1, 0))
        n = dim * dim
        pos4 = np.concatenate(
            [pos, np.full((n, 1), 2.0, np.float32)], axis=1).reshape(-1)
        config = {
            "cloth_pos": [0, 1, 0],
            "cloth_size": [dim, dim],
            "cloth_stiff": [0.9, 1.0, 0.9],
            "cloth_mass": 0.5,
            "mesh_verts": np.array([]),
        }
        state_dict = {
            "particle_pos": pos4,
            "particle_vel": np.zeros(n * 3, np.float32),
            "shape_pos": np.zeros(28, np.float32),
        }
        scene = scene_mod.set_scene(config, state_dict, capacity=n)
        np.testing.assert_allclose(np.asarray(scene.state.positions), pos)
        assert float(scene.state.inv_mass[0]) == 2.0
        assert int(scene.topo.dimx) == dim


def reference_pixel_to_3d(depth_im, x, y, fov=39.5978):
    """Oracle: the reference's matrix-based unprojection
    (environment/utils.py:179-234) for camera (0,2,0), lookat origin,
    up (0,0,1), including both sign quirks."""
    pos, lookat, up = (np.array([0., 2., 0.]), np.zeros(3),
                       np.array([0., 0., 1.]))
    f = lookat - pos
    f /= np.linalg.norm(f)
    u = up / np.linalg.norm(up)
    s = np.cross(f, u)
    s /= np.linalg.norm(s)
    u = np.cross(s, f)
    view = np.array([
        s[0], u[0], -f[0], 0,
        s[1], u[1], -f[1], 0,
        s[2], u[2], -f[2], 0,
        -s.dot(pos), -u.dot(pos), f.dot(pos), 1,
    ]).reshape(4, 4).T
    pose = np.linalg.inv(view)
    pose[:, 1:3] = -pose[:, 1:3]
    S = depth_im.shape[0]
    fl = (S / 2) / np.tan(np.pi * fov / 180 / 2)
    z = depth_im[y, x]
    cx = (x - S / 2) * z / fl
    cy = (y - S / 2) * z / fl
    p = pose @ np.array([cx, cy, z, 1.0])
    out = p[:3]
    out[0] = -out[0]
    return out


class TestCamera:
    def test_matches_reference_unprojection(self):
        S = 720
        depth = np.full((S, S), 1.7, np.float32)
        for (row, col) in [(100, 200), (360, 360), (600, 50)]:
            ref = reference_pixel_to_3d(depth, x=col, y=row)
            ours = np.asarray(cam.pixel_to_world(row, col, 1.7, S))
            np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_project_roundtrip(self):
        S = 400
        pts = jnp.asarray(
            np.random.default_rng(1).uniform(-0.5, 0.5, (50, 3)), jnp.float32)
        row, col, depth = cam.project(pts, S)
        back = cam.pixel_to_world(row, col, depth, S)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


class TestRenderer:
    def test_depth_and_mask(self):
        dim = 64
        height = 0.1
        pos = grid_positions(dim, dim, lower=(0.0, height, 0.0))
        pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
        active = jnp.ones(dim * dim, bool)
        rgb, depth = render_rgbd(jnp.asarray(pos), active, image_size=200)
        depth = np.asarray(depth)
        assert rgb.shape == (200, 200, 3) and depth.shape == (200, 200)
        mask = np.asarray(cloth_mask_from_depth(jnp.asarray(depth)))
        # center pixel is cloth at depth 2 - height
        assert mask[100, 100]
        assert abs(depth[100, 100] - (2.0 - height)) < 1e-3
        # corners are floor
        assert depth[0, 0] == pytest.approx(2.0)
        # mask area ~ cloth area: extent 0.4m at depth 1.9 -> ~40px
        frac = mask.mean()
        expect = (dim * 0.00625 * cam.focal_length(200) / 1.9 / 200) ** 2
        assert abs(frac - expect) / expect < 0.3

    def test_mask_is_solid(self):
        # no pinholes inside the cloth region at obs resolution
        dim = 32
        # resting height: cloth sits at the plane collision distance
        pos = grid_positions(dim, dim, lower=(0.0, 0.005, 0.0))
        pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
        active = jnp.ones(dim * dim, bool)
        _, depth = render_rgbd(jnp.asarray(pos), active, image_size=400)
        mask = np.asarray(cloth_mask_from_depth(depth))
        rows = np.where(mask.any(axis=1))[0]
        cols = np.where(mask.any(axis=0))[0]
        interior = mask[rows.min() + 3: rows.max() - 2,
                        cols.min() + 3: cols.max() - 2]
        assert interior.all()


class TestCoverageDegenerateBound:
    """K_SPAN stamp bound: a fully bunched-up wad (AABB extent below the
    stamp's reach) must report its radius-padded AABB footprint instead of
    silently undercounting."""

    def test_tiny_wad_reports_aabb(self):
        import numpy as np
        import jax.numpy as jnp
        from flingbot_tpu.env.coverage import get_current_covered_area

        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.01, 0.01, (500, 3)).astype(np.float32)
        area = float(get_current_covered_area(jnp.asarray(pts)))
        ext_x = pts[:, 0].max() - pts[:, 0].min() + 2 * 0.00625
        ext_z = pts[:, 2].max() - pts[:, 2].min() + 2 * 0.00625
        np.testing.assert_allclose(area, ext_x * ext_z, rtol=1e-5)

    def test_normal_cloth_unchanged(self):
        import numpy as np
        import jax.numpy as jnp
        from flingbot_tpu.engine.topology import grid_positions
        from flingbot_tpu.env.coverage import get_current_covered_area

        pos = grid_positions(64, 64)  # 0.4 m flat cloth
        area = float(get_current_covered_area(jnp.asarray(pos)))
        flat = (63 * 0.00625) ** 2
        assert abs(area - flat) / flat < 0.1  # stamped path, sane value
