"""Checkpoint / auto-resume.

Parity with the reference's flow (run_sim.py:82-88, utils.py:100-141):
`latest_ckpt.pth` every loop + `ckpt_{steps:06d}.pth` every --save_ckpt;
auto-resume from `{log}/latest_ckpt.pth`; eval mode derives a fresh
`{ckpt}_eval_{i}/` log dir.  Format is a pickle of numpy pytrees (not a
torch state dict — the nets are Flax)."""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, policy, extra: dict = None):
    payload = {"policy": _to_numpy(policy.state_dict())}
    if extra:
        payload.update(extra)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, policy) -> dict:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    policy.load_state_dict(payload["policy"])
    return payload


def setup_eval_dir(load_path: str) -> str:
    """Derive the `{ckpt}_eval_{i}/` replay dir (utils.py:125-137)."""
    prefix = str(load_path).split(".pth")[0]
    i = 0
    while os.path.exists(prefix + f"_eval_{i}/"):
        i += 1
    log = prefix + f"_eval_{i}/"
    os.makedirs(log, exist_ok=True)
    return log
