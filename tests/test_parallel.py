"""Multi-chip sharding tests on the 8-device virtual CPU mesh — the
capability the reference never had (its parallelism was process forking)."""

import numpy as np


class TestDryrun:
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import jax

        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (96, 64, 64)


class TestDpTrainStep:
    def test_dp_matches_single_device(self):
        import jax
        import jax.numpy as jnp
        import optax

        from flingbot_tpu.learning.nets import SpatialValueNet
        from flingbot_tpu.learning.train import masked_mse_loss
        from flingbot_tpu.parallel.mesh import (
            make_mesh, make_dp_train_step, replicate, shard_batch)

        net = SpatialValueNet(rgb_only=True)
        rng = jax.random.PRNGKey(0)
        obs = jax.random.normal(rng, (8, 4, 16, 16))
        mask = jnp.zeros((8, 16, 16)).at[:, 5, 5].set(1.0)
        reward = jnp.linspace(0, 1, 8)
        variables = net.init(rng, obs[:1], train=False)
        tx = optax.adamw(1e-3)

        # reference: mean of per-shard losses (BatchNorm normalizes within
        # each dp shard, so the oracle must shard the same way)
        shard_losses = []
        for k in range(4):
            loss_k, _ = masked_mse_loss(
                net, variables["params"], variables.get("batch_stats", {}),
                obs[2 * k:2 * k + 2], mask[2 * k:2 * k + 2],
                reward[2 * k:2 * k + 2])
            shard_losses.append(float(loss_k))
        loss_ref = float(np.mean(shard_losses))

        mesh = make_mesh(4)
        train_step = make_dp_train_step(net, tx, mesh)
        params = replicate(variables["params"], mesh)
        bs = replicate(variables.get("batch_stats", {}), mesh)
        opt_state = replicate(tx.init(variables["params"]), mesh)
        obs_s = shard_batch(obs, mesh)
        mask_s = shard_batch(mask, mesh)
        reward_s = shard_batch(reward, mesh)
        _, _, _, loss_dp = train_step(
            params, bs, opt_state, obs_s, mask_s, reward_s)
        # pmean of per-shard losses == global mean loss (equal shard sizes)
        np.testing.assert_allclose(
            float(loss_dp), float(loss_ref), rtol=1e-5)
