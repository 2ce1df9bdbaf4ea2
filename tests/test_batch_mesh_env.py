"""Batched mesh (shirt) environments: BatchSimEnv + eval harness must run
mesh-topology tasks (VERDICT round-2 item 4 — the shirt eval protocol,
reference README.md:136-141)."""

import h5py
import numpy as np
import pytest

from flingbot_tpu.env.batch_env import BatchSimEnv
from flingbot_tpu.env.tasks import TaskLoader, detect_mesh_caps
from tests.test_mesh_cloth import MESH_CAPS, mesh_task_file  # noqa: F401


class TestBatchMeshEnv:
    def test_detect_mesh_caps(self, mesh_task_file):
        caps = detect_mesh_caps(mesh_task_file)
        assert caps is not None and len(caps) == 3

    def test_batched_shirt_episode(self, mesh_task_file, tmp_path):
        loader = TaskLoader(mesh_task_file)
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
            mesh_caps=MESH_CAPS,
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
        assert env.episodes_done == 2  # episode_length=1 -> reload
        with h5py.File(replay, "r") as f:
            assert len(f) == 2
            for k in f:
                # shirt stat family tag (not mixed into rect 'hard')
                assert f[k].attrs["task_difficulty"] == "shirt"

    def test_mesh_chunk_steps_clamped(self, mesh_task_file, tmp_path):
        # rect-tuned chunk lengths kernel-fault the TPU worker on the much
        # slower mesh path (measured 2026-08-18: 192-step mesh chunks at
        # batch 16); the env must clamp them
        from flingbot_tpu.env.batch_env import MESH_CHUNK_STEPS_CAP

        loader = TaskLoader(mesh_task_file)
        with pytest.warns(UserWarning, match="clamping chunk_steps"):
            env = BatchSimEnv(
                get_task_fn=loader.get_next_task,
                num_envs=1,
                replay_buffer_path=str(tmp_path / "r.hdf5"),
                mesh_caps=MESH_CAPS,
                exec_mode="chunked",
                chunk_steps=192,
            )
        assert env.chunk_steps == MESH_CHUNK_STEPS_CAP
        # grid envs keep their chunk length (no mesh_caps -> no clamp)
        env2 = BatchSimEnv(
            get_task_fn=loader.get_next_task,
            num_envs=1,
            replay_buffer_path=str(tmp_path / "r2.hdf5"),
            exec_mode="chunked",
            chunk_steps=192,
        )
        assert env2.chunk_steps == 192
