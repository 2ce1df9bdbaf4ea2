"""End-to-end SimEnv episode test: generate a task, run policy steps, check
the replay buffer schema — the eval-harness contract the reference validates
operationally (SURVEY §4)."""

import h5py
import numpy as np
import jax.numpy as jnp
import pytest

from flingbot_tpu.env.tasks import TaskLoader, generate_randomization, write_task
from flingbot_tpu.env.sim_env import SimEnv
from flingbot_tpu.learning.nets import MaximumValuePolicy

MAX_DIM = 32


@pytest.fixture(scope="module")
def task_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tasks") / "tasks.hdf5")
    rng = np.random.default_rng(0)
    n = 0
    while n < 1:
        task = generate_randomization(
            rng,
            min_cloth_size=24,
            max_cloth_size=MAX_DIM,
            strict_min_edge_length=24,
            task_difficulty="hard",
            max_grid_dim=MAX_DIM,
        )
        if task is not None:
            write_task(path, task)
            n += 1
    return path


def make_env(task_file, tmp_path):
    loader = TaskLoader(task_file)
    replay = str(tmp_path / "replay.hdf5")
    env = SimEnv(
        get_task_fn=loader.get_next_task,
        replay_buffer_path=replay,
        obs_dim=64,
        num_rotations=4,
        scale_factors=[1.0, 1.5],
        action_primitives=["fling"],
        episode_length=2,
        render_dim=200,
        max_grid_dim=MAX_DIM,
        self_collision=False,
    )
    return env, replay


class TestSimEnvEpisode:
    def test_task_generation_settles(self, task_file):
        """Tiny test cloths (24-32 particles ~ 15 cm) are too stiff for
        their size to hold folds — after the speed-up-only clamp they land
        flat, so crumple STRENGTH is asserted by the in-file init-coverage
        stats of the TPU-generated data_r3 sets (ratio ~0.33-0.39 at dim
        100) instead.  Here we assert generation completes and settles: the
        state is at rest and the coverage is a sane flat-or-less footprint
        (1.12 bounds the axis-aligned stamp inflation of a rotated sheet)."""
        loader = TaskLoader(task_file)
        task = loader.get_next_task()
        assert task.initial_coverage < task.flatten_area * 1.12
        assert task.particle_pos.size > 0
        vel = np.asarray(task.particle_vel).reshape(-1)
        assert np.abs(vel).max() < 1e-2  # settled (wait_until_stable tol)

    def test_episode_and_replay(self, task_file, tmp_path):
        env, replay = make_env(task_file, tmp_path)
        policy = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=4,
            scale_factors=[1.0, 1.5], obs_dim=64, seed=0)
        obs = env.reset()
        assert obs.shape == (8, 4, 64, 64)
        init_cov = env.init_coverage
        assert init_cov > 0
        steps = 0
        episodes_done = 0
        while episodes_done == 0 and steps < 4:
            vms = policy.value_maps(obs)
            obs = env.step(vms)
            steps += 1
            if env.current_timestep == 0:
                episodes_done += 1
        # episode ended (terminate or length cap of 2)
        assert steps <= 2 or episodes_done

        with h5py.File(replay, "r") as f:
            keys = sorted(f.keys())
            assert len(keys) >= 1
            assert any("_last" in k for k in keys)
            g = f[keys[0]]
            # GraspDataset contract (learning/utils.py:58-85)
            assert "observations" in g and "actions" in g
            for attr in ("preaction_coverage", "postaction_coverage",
                         "max_coverage", "action_primitive",
                         "task_difficulty", "init_coverage"):
                assert attr in g.attrs, attr
            a = np.asarray(g["actions"])
            assert a.sum() == 1.0  # one-hot action mask
            assert np.asarray(g["observations"]).shape == (4, 64, 64)
