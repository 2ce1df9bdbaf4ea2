"""Value-net optimization: the DQN-style masked-MSE update.

Parity with the reference's only gradient path (run_sim.py:16-34): predict a
dense value map, select the executed pixel with the one-hot action mask, and
regress it to the normalized delta-coverage reward with MSE + Adam.

The jitted update is donate-argnum'd so params update in place on device;
`make_dp_train_step` in flingbot_tpu.parallel wraps the same loss in a
shard_map with a gradient psum for multi-chip data parallelism.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from flingbot_tpu.learning.nets import MaximumValuePolicy, NetState


def masked_mse_loss(net, params, batch_stats, obs, action_mask, reward):
    """Returns (loss, new_batch_stats)."""
    out, updates = net.apply(
        {"params": params, "batch_stats": batch_stats},
        obs, train=True, mutable=["batch_stats"],
    )
    pred = jnp.sum(out * action_mask, axis=(1, 2))
    loss = jnp.mean((pred - reward) ** 2)
    return loss, updates["batch_stats"]


@functools.partial(
    jax.jit, static_argnames=("net", "tx"), donate_argnums=(0, 2)
)
def _train_step(params, batch_stats, opt_state, obs, action_mask, reward,
                *, net, tx):
    (loss, new_bs), grads = jax.value_and_grad(
        lambda p: masked_mse_loss(net, p, batch_stats, obs, action_mask,
                                  reward),
        has_aux=True,
    )(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_bs, opt_state, loss


def train_on_batch(ns: NetState, obs, action_mask, reward) -> float:
    """One gradient step on one NetState; returns the loss."""
    ns.params, ns.batch_stats, ns.opt_state, loss = _train_step(
        ns.params, ns.batch_stats, ns.opt_state,
        jnp.asarray(obs), jnp.asarray(action_mask), jnp.asarray(reward),
        net=ns.net, tx=ns.tx,
    )
    ns.steps += 1
    return float(loss)


def optimize(
    policy: MaximumValuePolicy,
    dataset_factory,
    batch_size: int = 128,
    batches_per_update: int = 1,
    writer=None,
) -> Dict[str, float]:
    """optimize() parity (run_sim.py:16-34): one (or more) masked-MSE
    updates per primitive value net, each on a batch filtered to that
    primitive's transitions."""
    losses = {}
    for key, ns in policy.nets.items():
        try:
            ds = dataset_factory(key)
        except Exception:
            continue
        if ds is None or len(ds) < batch_size:
            continue
        for _ in range(batches_per_update):
            batch = ds.sample_batch(batch_size)
            if batch is None:
                break
            loss = train_on_batch(ns, *batch)
            losses[key] = loss
            if writer is not None:
                writer.add_scalar(f"loss/{key}", loss, global_step=ns.steps)
    return losses
