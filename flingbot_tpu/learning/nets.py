"""Spatial action-value networks + the maximum-value policy (Flax).

Topology parity with the reference (learning/nets.py:81-141): a fully
convolutional, resolution-preserving stack — 3x3 conv to 16 channels
(+BN+LeakyReLU), 8 residual blocks of two 3x3 convs with BN, and a final
3x3 conv to 1 value channel.  Observation normalization constants match
nets.py:94-95.  One net per action primitive (nets.py:258-260), epsilon-
greedy exploration on both the value maps and the primitive choice with
multiplicative decay (nets.py:248-293).

TPU notes: convs run in NHWC (XLA's preferred layout) and the 96-transform
stack is a single batch — there is no Ray fan-out to replace.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

OBS_MEAN = (0.18, 0.18, 0.18, 1.99)
OBS_STD = (0.1, 0.1, 0.1, 0.006)


class ResidualBlock(nn.Module):
    channels: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.channels, (3, 3), use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        return nn.relu(y + identity)


class SpatialValueNet(nn.Module):
    """Input (B, C, H, W) channel-first obs (rgb/255 ++ depth), output
    (B, H, W) dense value map."""

    rgb_only: bool = False
    depth_only: bool = False
    channels: int = 16
    num_blocks: int = 8

    @property
    def input_channels(self) -> int:
        if self.rgb_only:
            return 3
        if self.depth_only:
            return 1
        return 4

    def normalize(self, obs):
        mean = jnp.asarray(OBS_MEAN)
        std = jnp.asarray(OBS_STD)
        if self.rgb_only:
            obs, mean, std = obs[:, :3], mean[:3], std[:3]
        elif self.depth_only:
            obs, mean, std = obs[:, 3:4], mean[3:4], std[3:4]
        return (obs - mean[None, :, None, None]) / std[None, :, None, None]

    @nn.compact
    def __call__(self, obs, train: bool = False):
        x = self.normalize(obs)
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        x = nn.Conv(self.channels, (3, 3), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.channels)(x, train=train)
        x = nn.Conv(1, (3, 3), use_bias=False)(x)
        return x[..., 0]


class NetState:
    """Mutable host container for one value net: params, batch stats,
    optimizer state, and the persistent step counter the reference keeps as
    a non-grad Parameter (nets.py:102-103)."""

    def __init__(self, net: SpatialValueNet, rng, obs_dim: int,
                 lr: float = 1e-4, weight_decay: float = 1e-6):
        self.net = net
        dummy = jnp.zeros((1, 4, obs_dim, obs_dim))
        variables = net.init(rng, dummy, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.tx = optax.adamw(lr, weight_decay=weight_decay)
        self.opt_state = self.tx.init(self.params)
        self.steps = 0

    def state_dict(self) -> Dict[str, Any]:
        return {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "steps": self.steps,
        }

    def load_state_dict(self, d: Dict[str, Any]):
        self.params = d["params"]
        self.batch_stats = d["batch_stats"]
        self.opt_state = d["opt_state"]
        self.steps = int(d["steps"])


@functools.partial(jax.jit, static_argnames=("net",))
def value_map_inference(net: SpatialValueNet, params, batch_stats, obs):
    """obs (T, 4, D, D) -> (T, D, D) value maps, eval mode."""
    return net.apply(
        {"params": params, "batch_stats": batch_stats}, obs, train=False
    )


@functools.partial(jax.jit, static_argnames=("net",))
def value_map_inference_tta(net: SpatialValueNet, params, batch_stats, obs):
    """Dihedral test-time averaging: run the net on all 8 D4 transforms of
    each view and average the inverse-transformed value maps.  Physics is
    invariant under these transforms (see GraspDataset.dihedral_augment),
    so the 8 estimates are of the SAME value function — averaging reduces
    net variance at 8x inference cost (inference is <5% of a rollout)."""
    acc = jnp.zeros(obs.shape[:1] + obs.shape[-2:], obs.dtype)
    for k in range(4):
        for flip in (False, True):
            o = jnp.rot90(obs, k, axes=(-2, -1))
            if flip:
                o = o[..., ::-1]
            vm = net.apply(
                {"params": params, "batch_stats": batch_stats}, o,
                train=False)
            if flip:
                vm = vm[..., ::-1]
            acc = acc + jnp.rot90(vm, -k, axes=(-2, -1))
    return acc / 8.0


class MaximumValuePolicy:
    """One value net per primitive + epsilon-greedy exploration
    (MaximumValuePolicy parity, learning/nets.py:232-299)."""

    def __init__(
        self,
        action_primitives: Sequence[str],
        num_rotations: int,
        scale_factors: Sequence[float],
        obs_dim: int,
        pix_grasp_dist: int = 8,
        pix_drag_dist: int = 10,
        pix_place_dist: int = 10,
        action_expl_prob: float = 0.0,
        action_expl_decay: float = 0.9995,
        value_expl_prob: float = 0.0,
        value_expl_decay: float = 0.995,
        rgb_only: bool = True,
        depth_only: bool = False,
        lr: float = 1e-4,
        weight_decay: float = 1e-6,
        tta: bool = False,
        seed: int = 0,
        **_unused,
    ):
        assert len(action_primitives) > 0
        self.action_primitives = list(action_primitives)
        # rotation formula parity (nets.py:213-217 / simEnv.py:70-76)
        if "fling" in self.action_primitives:
            self.rotations = [
                (2 * i / (num_rotations - 1) - 1) * 90
                for i in range(num_rotations)
            ]
        else:
            self.rotations = [
                (2 * i / num_rotations - 1) * 180 for i in range(num_rotations)
            ]
        self.scale_factors = list(float(s) for s in scale_factors)
        self.num_transforms = len(self.rotations) * len(self.scale_factors)
        self.obs_dim = obs_dim
        self.pix_grasp_dist = pix_grasp_dist
        self.pix_drag_dist = pix_drag_dist
        self.pix_place_dist = pix_place_dist
        self.action_expl_prob = float(action_expl_prob)
        self.action_expl_decay = float(action_expl_decay)
        self.value_expl_prob = float(value_expl_prob)
        self.value_expl_decay = float(value_expl_decay)
        # dihedral test-time averaging (value_map_inference_tta)
        self.tta = bool(tta)

        rng = jax.random.PRNGKey(seed)
        self.nets: Dict[str, NetState] = {}
        net_module = SpatialValueNet(rgb_only=rgb_only, depth_only=depth_only)
        for i, key in enumerate(self.action_primitives):
            self.nets[key] = NetState(
                net_module, jax.random.fold_in(rng, i), obs_dim,
                lr=lr, weight_decay=weight_decay,
            )
        self._rng = jax.random.fold_in(rng, 1234)

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def decay_exploration(self):
        self.action_expl_prob *= self.action_expl_decay
        self.value_expl_prob *= self.value_expl_decay

    def steps(self) -> int:
        return sum(n.steps for n in self.nets.values())

    def _infer(self, ns: NetState, obs):
        fn = value_map_inference_tta if self.tta else value_map_inference
        return fn(ns.net, ns.params, ns.batch_stats, obs)

    def value_maps(self, obs_stack) -> Dict[str, jnp.ndarray]:
        """obs_stack (T, 4, D, D) -> {primitive: (T, D, D)} with value/action
        exploration applied (get_action_single parity, nets.py:276-293)."""
        out = {}
        for key, ns in self.nets.items():
            if np.random.random() < self.value_expl_prob:
                vm = jax.random.uniform(
                    self._next_rng(),
                    (self.num_transforms, self.obs_dim, self.obs_dim),
                )
            else:
                vm = self._infer(ns, obs_stack)
            out[key] = vm
        if np.random.random() < self.action_expl_prob:
            keys = list(out.keys())
            chosen = keys[np.random.randint(len(keys))]
            min_val = out[chosen].min()
            out = {
                k: (v if k == chosen else jnp.full_like(v, min_val))
                for k, v in out.items()
            }
        return out

    def act(self, obs_stacks: List) -> List[Dict[str, jnp.ndarray]]:
        return [self.value_maps(o) for o in obs_stacks]

    def batch_value_maps(self, obs: jnp.ndarray,
                         max_infer_batch: int = 4096) -> jnp.ndarray:
        """(B, T, 4, D, D) -> (B, P, T, D, D) for BatchSimEnv: the whole
        env batch runs through each net as one flattened conv batch
        (sliced to <= max_infer_batch images to bound activation memory at
        large env counts)."""
        B, T = obs.shape[0], obs.shape[1]
        flat = obs.reshape((B * T,) + obs.shape[2:])
        n = flat.shape[0]
        maps = []
        for key in self.action_primitives:
            ns = self.nets[key]
            if n <= max_infer_batch:
                vm = self._infer(ns, flat)
            else:
                # equal-size slices -> one compiled program per shape
                k = -(-n // max_infer_batch)
                step = -(-n // k)
                pad = k * step - n
                fp = jnp.concatenate([flat, flat[:pad]]) if pad else flat
                vm = jnp.concatenate([
                    self._infer(ns, fp[s:s + step])
                    for s in range(0, k * step, step)])[:n]
            maps.append(vm.reshape(B, T, self.obs_dim, self.obs_dim))
        out = jnp.stack(maps, axis=1)  # (B, P, T, D, D)
        # exploration (per whole batch step, cheaper than per env)
        if np.random.random() < self.value_expl_prob:
            out = jax.random.uniform(self._next_rng(), out.shape)
        if len(self.action_primitives) > 1 and (
                np.random.random() < self.action_expl_prob):
            p = np.random.randint(len(self.action_primitives))
            min_val = out.min()
            keep = out[:, p:p + 1]
            out = jnp.full_like(out, min_val)
            out = out.at[:, p:p + 1].set(keep)
        return out

    # -- checkpointing ------------------------------------------------------

    def state_dict(self) -> Dict[str, Any]:
        return {
            "nets": {k: ns.state_dict() for k, ns in self.nets.items()},
            "action_expl_prob": self.action_expl_prob,
            "value_expl_prob": self.value_expl_prob,
        }

    def load_state_dict(self, d: Dict[str, Any]):
        for k, ns in self.nets.items():
            ns.load_state_dict(d["nets"][k])
        self.action_expl_prob = float(d.get("action_expl_prob", 0.0))
        self.value_expl_prob = float(d.get("value_expl_prob", 0.0))
