"""Training-path tests: dataset sampling, masked-MSE updates, checkpoints."""

import numpy as np
import pytest

from flingbot_tpu.learning.dataset import GraspDataset
from flingbot_tpu.learning.memory import Memory
from flingbot_tpu.learning.nets import MaximumValuePolicy
from flingbot_tpu.learning.train import optimize, train_on_batch
from flingbot_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from flingbot_tpu.utils.stats import collect_stats


@pytest.fixture()
def replay(tmp_path):
    path = str(tmp_path / "replay.hdf5")
    rng = np.random.default_rng(0)
    for ep in range(4):
        mem = Memory()
        for step in range(3):
            obs = rng.uniform(0, 1, (4, 16, 16)).astype(np.float32)
            obs[3] = 1.99
            mem.add_observation(obs)
            mask = np.zeros((16, 16), np.float32)
            mask[rng.integers(16), rng.integers(16)] = 1
            mem.add_action(mask)
            mem.add_value("preaction_coverage", 0.10)
            mem.add_value("postaction_coverage", 0.15)
            mem.add_value("max_coverage", 0.25)
            mem.add_value("action_primitive", "fling")
            mem.add_value("task_difficulty", "hard")
            mem.add_value("init_coverage", 0.08)
            mem.add_rewards_and_termination(0.05, step == 2)
        mem.dump(path)
    return path


class TestDataset:
    def test_sample_batch(self, replay):
        ds = GraspDataset(replay, rgb_only=True, obs_color_jitter=True)
        assert len(ds) == 12
        obs, mask, reward = ds.sample_batch(6)
        assert obs.shape == (6, 4, 16, 16)
        assert mask.shape == (6, 16, 16)
        # normalized reward = (0.15 - 0.10) / 0.25
        np.testing.assert_allclose(reward, 0.2, atol=1e-6)

    def test_filter_fn(self, replay):
        ds = GraspDataset(
            replay, filter_fn=lambda g:
            g.attrs["action_primitive"] == "drag")
        assert len(ds) == 0

    def test_check_validity_deletes_malformed(self, replay):
        import h5py

        with h5py.File(replay, "a") as f:
            g = f.create_group("zzz_step00_last")
            g.create_dataset("actions", data=np.zeros((16, 16)))
        ds = GraspDataset(replay, check_validity=True)
        assert all("zzz" not in k for k in ds.keys)


class TestTrainStep:
    def test_loss_decreases(self, replay):
        policy = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=2,
            scale_factors=[1.0], obs_dim=16, lr=1e-3)
        ds = GraspDataset(replay, rgb_only=True, obs_color_jitter=False)
        batch = ds.sample_batch(12)
        ns = policy.nets["fling"]
        losses = [train_on_batch(ns, *batch) for _ in range(30)]
        assert losses[-1] < losses[0] * 0.5
        assert ns.steps == 30

    def test_optimize_parity_flow(self, replay):
        policy = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=2,
            scale_factors=[1.0], obs_dim=16)
        losses = optimize(
            policy,
            lambda prim: GraspDataset(
                replay, rgb_only=True, obs_color_jitter=False,
                filter_fn=lambda g: g.attrs["action_primitive"] == prim),
            batch_size=8,
        )
        assert "fling" in losses

    def test_checkpoint_roundtrip(self, replay, tmp_path):
        policy = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=2,
            scale_factors=[1.0], obs_dim=16)
        ds = GraspDataset(replay, rgb_only=True, obs_color_jitter=False)
        train_on_batch(policy.nets["fling"], *ds.sample_batch(4))
        path = str(tmp_path / "ckpt.pth")
        save_checkpoint(path, policy)
        policy2 = MaximumValuePolicy(
            action_primitives=["fling"], num_rotations=2,
            scale_factors=[1.0], obs_dim=16, seed=7)
        load_checkpoint(path, policy2)
        assert policy2.nets["fling"].steps == 1
        import jax.numpy as jnp

        obs = jnp.zeros((1, 4, 16, 16))
        v1 = policy.value_maps(obs)["fling"]
        v2 = policy2.value_maps(obs)["fling"]
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


class TestStats:
    def test_collect_stats_keys(self, replay):
        stats = collect_stats(replay)
        assert stats["delta_coverage/hard/mean"] == pytest.approx(0.2)
        assert stats["final_coverage/hard/mean"] == pytest.approx(0.6)
        assert stats["episode_length/hard/mean"] == 2.0
        assert stats["action_primitive/percent_fling"] == 1.0
        assert "delta_coverage/hard/percent_positive" in stats


def test_offline_trainer_script(tmp_path):
    """scripts/offline_train_r3.py resumes a run dir (args.pkl +
    latest_ckpt + replay buffer) and saves numbered ckpts — round 4's
    post-collection training path."""
    import os
    import pickle
    import subprocess
    import sys

    import h5py  # noqa: F401

    from flingbot_tpu.learning.memory import Memory
    from flingbot_tpu.learning.nets import MaximumValuePolicy
    from flingbot_tpu.utils.checkpoint import save_checkpoint

    log = tmp_path / "run"
    log.mkdir()
    args = dict(action_primitives=["fling"], num_rotations=4,
                scale_factors=[1.0], obs_dim=32, seed=0)
    with open(log / "args.pkl", "wb") as f:
        pickle.dump(args, f)
    policy = MaximumValuePolicy(**args)
    save_checkpoint(str(log / "latest_ckpt.pth"), policy)
    mem = Memory()
    for step in range(6):
        mem.add_observation(np.random.rand(4, 32, 32).astype(np.float32))
        a = np.zeros((32, 32), np.float32)
        a[step, step] = 1.0
        mem.add_action(a)
        mem.add_value("preaction_coverage", 0.3)
        mem.add_value("postaction_coverage", 0.4)
        mem.add_value("max_coverage", 1.0)
        mem.add_value("action_primitive", "fling")
        mem.add_value("task_difficulty", "hard")
        mem.add_value("init_coverage", 0.3)
        mem.add_rewards_and_termination(0.1, step == 5)
    mem.dump(str(log / "replay_buffer.hdf5"))

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "/root/repo/scripts/offline_train_r3.py",
         "--log", str(log), "--steps", "2", "--save_every", "1",
         "--batch_size", "4"],
        env=env, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    cks = sorted(log.glob("ckpt_*.pth"))
    assert len(cks) == 2, (out.stdout, out.stderr[-500:])
