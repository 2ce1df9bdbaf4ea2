"""BatchSimEnv: the vmapped Ray-pool replacement, plus a run_sim smoke."""

import subprocess
import sys

import h5py
import numpy as np
import pytest

from flingbot_tpu.env.batch_env import BatchSimEnv
from flingbot_tpu.env.tasks import TaskLoader
from flingbot_tpu.learning.nets import MaximumValuePolicy
from tests.test_sim_env import MAX_DIM, task_file  # fixture reuse  # noqa


class TestBatchEnv:
    def test_lockstep_episodes_and_replay(self, task_file, tmp_path):
        loader = TaskLoader(task_file)
        replay = str(tmp_path / "replay.hdf5")
        env = BatchSimEnv(
            get_task_fn=loader.get_next_task,
            num_envs=2,
            replay_buffer_path=replay,
            obs_dim=64,
            num_rotations=2,
            scale_factors=[1.0, 1.5],
            action_primitives=["fling"],
            episode_length=1,
            render_dim=128,
            max_grid_dim=MAX_DIM,
            self_collision=False,
        )
        policy = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=2,
            scale_factors=[1.0, 1.5], obs_dim=64)
        obs = env.reset()
        assert obs.shape == (2, 4, 4, 64, 64)
        vm = policy.batch_value_maps(obs)
        assert vm.shape == (2, 1, 4, 64, 64)
        obs2 = env.step(vm)
        assert obs2.shape == (2, 4, 4, 64, 64)
        # episode_length=1 -> both envs terminated and reloaded
        assert env.episodes_done == 2
        assert (env.timesteps == 0).all()
        with h5py.File(replay, "r") as f:
            assert len(f) == 2
            assert all("_last" in k for k in f)

    def test_obs_chunk_caps_observe_batch(self, task_file):
        """The observation (96-view warp) path is the HBM hog: a full-width
        observe call at 256 envs OOM'd the chip (20.3G/15.75G, 2026-08-19),
        so _observe slices the env batch to obs_chunk envs per device call
        independently of env_chunk.  Chunked observe must be shape- and
        value-identical to the full-width call."""
        loader = TaskLoader(task_file, repeat=True)
        kw = dict(
            get_task_fn=loader.get_next_task,
            num_envs=4,
            obs_dim=64,
            num_rotations=2,
            scale_factors=[1.0, 1.5],
            episode_length=1,
            render_dim=128,
            max_grid_dim=MAX_DIM,
            self_collision=False,
            domain_randomization=False,
            seed=3,
        )
        # obs_chunk rounds down to a divisor of num_envs (3 -> 2)
        env = BatchSimEnv(obs_chunk=3, **kw)
        assert env.obs_chunk == 2
        assert env.env_chunk == 4  # sim width unaffected
        obs_chunked = env.reset()
        loader2 = TaskLoader(task_file, repeat=True)
        kw["get_task_fn"] = loader2.get_next_task
        env_full = BatchSimEnv(obs_chunk=4, **kw)
        assert env_full.obs_chunk == 4
        obs_full = env_full.reset()
        np.testing.assert_allclose(
            np.asarray(obs_chunked), np.asarray(obs_full), atol=1e-6)

    def test_observe_subset_updates_host_mirrors(self, task_file):
        """Reloaded slots scatter fresh rgb/depth into the host mirrors
        in place; np.asarray views of jax arrays are READ-ONLY, which
        crashed every mid-session reload on TPU (2026-08-20 probe:
        'assignment destination is read-only' in _observe_subset)."""
        loader = TaskLoader(task_file, repeat=True)
        env = BatchSimEnv(
            get_task_fn=loader.get_next_task,
            num_envs=2,
            obs_dim=64,
            num_rotations=2,
            scale_factors=[1.0, 1.5],
            episode_length=1,
            render_dim=128,
            max_grid_dim=MAX_DIM,
            self_collision=False,
            domain_randomization=False,
            seed=3,
        )
        env.reset()
        before = env._rgb_np.copy()
        # perturb slot 0's state so its re-observation must differ
        import jax.numpy as jnp

        shift = jnp.zeros_like(env.state.positions)
        shift = shift.at[0, :, 0].set(0.05)
        env.state = env.state.replace(positions=env.state.positions + shift)
        env._observe_subset([0])  # must not raise (writable mirrors)
        assert not np.array_equal(env._rgb_np[0], before[0])
        np.testing.assert_array_equal(env._rgb_np[1], before[1])


@pytest.mark.slow
class TestRunSimSmoke:
    def test_run_sim_eval_mode(self, task_file, tmp_path):
        """run_sim.py --eval runs episodes over the whole task set and
        writes the *_eval_0 replay dir (utils.py:125-137 contract)."""
        log = tmp_path / "run"
        log.mkdir()
        # create a checkpoint to evaluate
        policy = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=2,
            scale_factors=[1.0], obs_dim=64)
        from flingbot_tpu.utils.checkpoint import save_checkpoint

        ckpt = str(log / "ckpt.pth")
        save_checkpoint(ckpt, policy)
        cmd = [
            sys.executable, "run_sim.py",
            "--tasks", task_file,
            "--load", ckpt,
            "--eval",
            "--num_envs", "1",
            "--num_rotations", "2",
            "--scale_factors", "1.0",
            "--episode_length", "1",
            "--render_dim", "128",
            "--max_grid_dim", str(MAX_DIM),
            "--no_self_collision",
            "--log", str(log),
        ]
        import os

        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1200, env=env,
            cwd="/root/repo")
        assert out.returncode == 0, out.stderr[-2000:]
        eval_dir = ckpt.split(".pth")[0] + "_eval_0/"
        assert os.path.exists(eval_dir + "replay_buffer.hdf5"), out.stdout
