"""Episode video capture (reference records frames during movep and dumps
mp4s at episode end: simEnv.py:764-768, 782-807; gallery: visualize.py)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from flingbot_tpu.engine.state import ClothState, SolverParams
from flingbot_tpu.engine.topology import build_grid_topology, grid_positions
from flingbot_tpu.env.primitives import (
    PROGRAM_BUILDERS,
    PrimitiveConfig,
    run_program,
)

D = 16


def _setup():
    pos = grid_positions(D, D, lower=(0.0, 0.005, 0.0))
    pos[:, [0, 2]] -= pos[:, [0, 2]].mean(axis=0)
    n = D * D
    state = ClothState.create(pos, np.full(n, n / 0.2, np.float32))
    topo = build_grid_topology(D, D, max_dimx=D, max_dimy=D)
    return state, topo, pos, n


class TestFrameRecording:
    def test_run_program_records_decimated_frames(self):
        state, topo, pos, n = _setup()
        cfg = PrimitiveConfig(max_program_steps=200)
        p1 = jnp.asarray(pos[D // 2], jnp.float32)
        p2 = jnp.asarray(pos[n - D // 2 - 1], jnp.float32)
        prog, fh = PROGRAM_BUILDERS["fling"](
            p1, p2, jnp.float32(1), jnp.float32(1), cfg)
        dist = jnp.linalg.norm(p1 - p2)
        st, term, frames, nf = run_program(
            state, topo, SolverParams(), prog, dist, fh, max_steps=200,
            substeps=2, iterations=6, record_frames=64, record_every=4)
        nf = int(nf)
        assert 5 < nf <= 64
        # frames actually show motion
        motion = np.abs(
            np.asarray(frames[:nf]) - np.asarray(frames[0])).max()
        assert motion > 0.01
        # unrecorded slots stay zero
        assert float(jnp.abs(frames[nf:]).max()) == 0.0

    def test_no_recording_keeps_two_tuple(self):
        state, topo, pos, n = _setup()
        cfg = PrimitiveConfig(max_program_steps=50)
        p1 = jnp.asarray(pos[D // 2], jnp.float32)
        p2 = jnp.asarray(pos[n - D // 2 - 1], jnp.float32)
        prog, fh = PROGRAM_BUILDERS["fling"](
            p1, p2, jnp.float32(1), jnp.float32(1), cfg)
        out = run_program(
            state, topo, SolverParams(), prog, jnp.linalg.norm(p1 - p2), fh,
            max_steps=50, substeps=2, iterations=6)
        assert len(out) == 2


class TestVideoWriter:
    def test_webm_written_from_frames(self):
        import cv2

        from flingbot_tpu.env.sim_env import SimEnv

        state, topo, pos, n = _setup()
        d = tempfile.mkdtemp()
        env = SimEnv.__new__(SimEnv)
        env.replay_buffer_path = os.path.join(d, "replay.hdf5")
        env.state = state
        env.dr_key = None
        env.episode_count = 1
        # two chunks of synthetic frames: cloth translating sideways
        f1 = np.stack([pos + np.array([0.002 * i, 0, 0]) for i in range(8)])
        f2 = np.stack([pos + np.array([0.016 + 0.002 * i, 0, 0])
                       for i in range(8)])
        env._episode_frames = [f1.astype(np.float32), f2.astype(np.float32)]
        path = env._write_episode_video()
        assert os.path.exists(path) and path.endswith(".webm")
        cap = cv2.VideoCapture(path)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 16
