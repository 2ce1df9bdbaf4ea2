"""pyflex_compat: the drop-in module-API shim over the TPU engine."""

import numpy as np
import pytest

from flingbot_tpu import pyflex_compat as pyflex


@pytest.fixture(autouse=True)
def _scene():
    """Each test gets a fresh scene (xdist workers share no module state)."""
    pyflex.init(True, True, 128, 128)
    params = np.array([
        0.0, 0.005, 0.0, 12, 12, 0.9, 1.0, 0.9, 2,
        0, 2, 0, np.pi / 2, -np.pi / 2, 0, 128, 128, 0.3, 0,
    ], np.float32)
    pyflex.set_scene(0, params, np.array([]))


class TestPyflexCompat:
    def test_scene_step_positions_roundtrip(self):
        pyflex.init(True, True, 128, 128)
        # 19-float param vector in flex_utils.py:332-342 order:
        # cloth_pos(3), cloth_size(2), stiff(3), render_mode,
        # cam_pos(3), cam_angle(3), cam_w, cam_h, mass, flip
        params = np.array([
            0.0, 0.005, 0.0, 12, 12, 0.9, 1.0, 0.9, 2,
            0, 2, 0, np.pi / 2, -np.pi / 2, 0, 128, 128, 0.3, 0,
        ], np.float32)
        pyflex.set_scene(0, params, np.array([]))
        pos0 = pyflex.get_positions().reshape(-1, 4)
        assert pos0.shape[0] == 144
        for _ in range(5):
            pyflex.step()
        pos1 = pyflex.get_positions().reshape(-1, 4)
        # gravity acted (positions changed)
        assert np.abs(pos1[:, :3] - pos0[:, :3]).max() > 1e-5

        # setter roundtrip
        pyflex.set_positions(pos0.reshape(-1))
        np.testing.assert_allclose(
            pyflex.get_positions(), pos0.reshape(-1), atol=1e-6)
        v = pyflex.get_velocities()
        pyflex.set_velocities(np.zeros_like(v))
        assert np.abs(pyflex.get_velocities()).max() == 0

    def test_shape_states_and_render(self):
        sp = pyflex.get_shape_states().reshape(-1, 14)
        sp[:, :3] = [[0.1, 0.2, 0.1], [-0.1, 0.2, 0.1]]
        pyflex.set_shape_states(sp.reshape(-1))
        out = pyflex.get_shape_states().reshape(-1, 14)
        np.testing.assert_allclose(out[0, :3], [0.1, 0.2, 0.1], atol=1e-6)

        rgba, depth = pyflex.render()
        assert rgba.shape == (128 * 128 * 4,)
        assert depth.shape == (128 * 128,)
        # floor at depth 2.0 somewhere
        assert np.isclose(depth.max(), 2.0, atol=1e-3)

    def test_faces(self):
        faces = pyflex.get_faces().reshape(-1, 3)
        assert faces.shape[0] == 2 * 11 * 11
