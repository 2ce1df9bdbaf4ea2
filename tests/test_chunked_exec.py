"""Chunked (host-driven, bounded device calls) vs fused (one while_loop)
execution parity.

The chunked path exists to bound per-device-call wall time (the round-2 TPU
worker kernel fault on long-running vmapped programs); it must be
numerically identical to the fused step_core path: the STABILIZE program
phase replays exactly the fused postaction (release + park + settle,
reference simEnv.py:466-477)."""

import numpy as np
import pytest

from flingbot_tpu.env.batch_env import BatchSimEnv
from flingbot_tpu.env.tasks import TaskLoader
from tests.test_sim_env import MAX_DIM, task_file  # fixture reuse  # noqa


def _mk_env(task_file, tmp_path, name, **kw):
    loader = TaskLoader(task_file)
    kw.setdefault("episode_length", 2)
    return BatchSimEnv(
        get_task_fn=loader.get_next_task,
        num_envs=2,
        replay_buffer_path=str(tmp_path / f"{name}.hdf5"),
        obs_dim=64,
        num_rotations=2,
        scale_factors=[1.0, 1.5],
        render_dim=128,
        max_grid_dim=MAX_DIM,
        self_collision=False,
        seed=7,
        **kw,
    )


class TestChunkedExecution:
    def test_chunked_matches_fused(self, task_file, tmp_path):
        env_f = _mk_env(task_file, tmp_path, "fused", exec_mode="fused")
        env_c = _mk_env(task_file, tmp_path, "chunked", exec_mode="chunked",
                        chunk_steps=23)  # odd, small -> many chunk calls
        obs_f = np.asarray(env_f.reset())
        obs_c = np.asarray(env_c.reset())
        np.testing.assert_allclose(obs_f, obs_c, atol=1e-6)

        rng = np.random.default_rng(3)
        vm = rng.uniform(size=(2, 1, obs_f.shape[1], 64, 64)).astype(
            np.float32)
        env_f.step(vm)
        env_c.step(vm)
        np.testing.assert_allclose(
            np.asarray(env_f.state.positions),
            np.asarray(env_c.state.positions), atol=1e-4)
        for i in range(2):
            pre_f = env_f.memories[i] if env_f.timesteps[i] else None
            pre_c = env_c.memories[i] if env_c.timesteps[i] else None
            assert (pre_f is None) == (pre_c is None)
        assert env_f.episodes_done == env_c.episodes_done

    def test_scan_chunk_loop_matches_while(self, task_file, tmp_path):
        """program_chunk loop='scan' (static trip count + done mask) must
        be numerically identical to the while_loop form — a vmapped
        while_loop already executes every lane per trip with per-lane
        masking, the scan just makes it explicit."""
        env_w = _mk_env(task_file, tmp_path, "loopw", exec_mode="chunked",
                        chunk_steps=23)
        env_s = _mk_env(task_file, tmp_path, "loops", exec_mode="chunked",
                        chunk_steps=23, chunk_loop="scan")
        obs_w = np.asarray(env_w.reset())
        obs_s = np.asarray(env_s.reset())
        np.testing.assert_allclose(obs_w, obs_s, atol=1e-6)
        rng = np.random.default_rng(3)
        vm = rng.uniform(size=(2, 1, obs_w.shape[1], 64, 64)).astype(
            np.float32)
        env_w.step(vm)
        env_s.step(vm)
        np.testing.assert_allclose(
            np.asarray(env_w.state.positions),
            np.asarray(env_s.state.positions), atol=1e-5)
        assert env_w.episodes_done == env_s.episodes_done

    def test_chunked_multi_primitive(self, task_file, tmp_path):
        """Padded+stacked program selection (fling/place differ in length)
        must run and terminate under chunked execution."""
        env = _mk_env(task_file, tmp_path, "multi", exec_mode="chunked",
                      chunk_steps=50,
                      action_primitives=["fling", "place"])
        obs = env.reset()
        rng = np.random.default_rng(0)
        vm = rng.uniform(
            size=(2, 2, np.asarray(obs).shape[1], 64, 64)).astype(np.float32)
        obs2 = env.step(vm)
        assert np.asarray(obs2).shape == np.asarray(obs).shape
        assert (env.timesteps <= 1).all()

    def test_reload_settles_and_records_init_coverage(
            self, task_file, tmp_path):
        """Episode N>0 first state gets the same settle as reset() and
        init_coverage is recorded per episode (VERDICT weak #4)."""
        env = _mk_env(task_file, tmp_path, "reload", exec_mode="chunked",
                      episode_length=1)
        env.reset()
        cov0 = env.init_coverage.copy()
        assert (cov0 > 0).all()
        rng = np.random.default_rng(1)
        vm = rng.uniform(size=(2, 1, env.obs.obs_stack.shape[1], 64, 64)
                         ).astype(np.float32)
        env.step(vm)  # episode_length=1 -> both slots reload
        assert env.episodes_done == 2
        assert (env.init_coverage > 0).all()


def test_contact_knobs_plumb_through(task_file, tmp_path):
    """--contact_iterations/--contact_window reach the solver (sweep configs
    from scripts/perf_sweep_r3.py must be reproducible in training/eval)."""
    loader = TaskLoader(task_file)
    env = BatchSimEnv(
        get_task_fn=loader.get_next_task, num_envs=2,
        replay_buffer_path=str(tmp_path / "knobs.hdf5"),
        obs_dim=64, num_rotations=2, scale_factors=[1.0, 1.5],
        render_dim=128, max_grid_dim=MAX_DIM, seed=7, episode_length=2,
        exec_mode="chunked", chunk_steps=16, self_collision=True,
        contact_mode="sort", contact_every=2,
        contact_iterations=4, contact_window=8, spring_mode="chebyshev")
    assert env.sim_kw["contact_iterations"] == 4
    assert env.sim_kw["contact_window"] == 8
    obs = np.asarray(env.reset())
    vm = np.random.default_rng(0).uniform(
        size=(2, 1, obs.shape[1], 64, 64)).astype(np.float32)
    env.step(vm)  # must compile + run with the non-default knobs


def test_chunk_on_done_carry_is_noop(task_file, tmp_path):
    """program_chunk on a finished carry returns immediately with the carry
    unchanged — the invariant the pipelined dispatch in
    BatchSimEnv._step_device_chunked relies on (it enqueues chunk k+1
    before blocking on chunk k's done flag, so one overshoot chunk runs on
    an already-done carry every step)."""
    import jax

    env = _mk_env(task_file, tmp_path, "noop", exec_mode="chunked",
                  chunk_steps=64)
    obs = np.asarray(env.reset())
    vm = np.random.default_rng(0).uniform(
        size=(2, 1, obs.shape[1], 64, 64)).astype(np.float32)
    import jax.numpy as jnp

    rot = jnp.asarray(env.rotations)
    sel, pre_cov, pre_pos, carry, prog = env._vm_begin(
        env.state, env.topo, env.params, jnp.asarray(vm), env.obs, rot)
    for _ in range(200):
        carry, done = env._vm_chunk(carry, env.topo, env.params, prog)
        if bool(np.all(np.asarray(done))):
            break
    assert bool(np.all(np.asarray(done)))
    carry2, done2 = env._vm_chunk(carry, env.topo, env.params, prog)
    assert bool(np.all(np.asarray(done2)))
    for a, b in zip(jax.tree_util.tree_leaves(carry),
                    jax.tree_util.tree_leaves(carry2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
