"""Device-mesh parallelism: env-axis sharding + data-parallel training.

The reference scales by forking Ray actors, one CUDA solver per process
(utils.py:144-157), and trains single-GPU.  The TPU-native analog
(SURVEY §2.3): hundreds of vmapped envs per chip, the env axis sharded over
the mesh's `dp` axis via NamedSharding (XLA partitions the whole
step/render/inference program with zero code changes), and gradient psum
over the same axis via shard_map for the value-net update.

All collectives ride ICI; there is no host-mediated communication anywhere
in the training step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(n_devices: Optional[int] = None, axis: str = DP_AXIS) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), (axis,))


def shard_batch(tree, mesh: Mesh, axis: str = DP_AXIS):
    """Place a leading-batch pytree with the batch axis sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (model params)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def make_dp_train_step(net, tx, mesh: Mesh, axis: str = DP_AXIS):
    """Data-parallel masked-MSE update: per-shard grads + psum over `axis`.

    Batch arrays must be sharded over `axis` on their leading dim; params,
    batch_stats, and opt_state replicated.  Returns a jitted function
    (params, batch_stats, opt_state, obs, mask, reward) ->
    (params, batch_stats, opt_state, loss)."""
    from jax import shard_map

    from flingbot_tpu.learning.train import masked_mse_loss

    def local_step(params, batch_stats, opt_state, obs, action_mask, reward):
        def loss_fn(p):
            loss, new_bs = masked_mse_loss(
                net, p, batch_stats, obs, action_mask, reward)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        # batch stats: average the running stats across shards
        new_bs = jax.lax.pmean(new_bs, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    rep = P()
    sh = P(axis)
    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(rep, rep, rep, sh, sh, sh),
        out_specs=(rep, rep, rep, rep),
    )
    return jax.jit(fn)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Multi-host initialization (DCN) — jax.distributed over pod slices.

    Single-slice training needs nothing (ICI collectives only); call this
    once per host before make_mesh when scaling past one slice.  Mirrors
    the SURVEY §2.3 disposition: DCN only if multi-slice."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_env_sharding(mesh: Mesh, axis: str = DP_AXIS) -> NamedSharding:
    """Sharding for BatchSimEnv state pytrees (leading env axis over dp)."""
    return NamedSharding(mesh, P(axis))
