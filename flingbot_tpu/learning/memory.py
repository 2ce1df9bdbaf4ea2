"""Episode replay memory with a flingbot-compatible HDF5 dump.

Schema parity with the reference writer (learning/Memory.py:106-165): each
episode dumps one group per step named ``{episode:09d}_step{NN}`` (the final
step suffixed ``_last``); python scalars become group attrs, arrays become
gzip'd datasets.  Downstream consumers — GraspDataset (learning/utils.py),
collect_stats (utils.py:186-391), visualize.py — read this layout, so both
the reference's tooling and ours work on either's replay buffers.
"""

from __future__ import annotations

import random
from copy import deepcopy
from typing import Dict, List

import h5py
import numpy as np

try:
    from filelock import FileLock
except ImportError:  # pragma: no cover
    import contextlib

    def FileLock(_p):  # type: ignore
        return contextlib.nullcontext()

BASE_KEYS = ["observations", "actions", "rewards", "is_terminal"]
_FIRST_STEP_ONLY = ["visualization_dir", "faces", "gripper_states", "states"]


class Memory:
    """Append-only episode log with the reference's length invariants
    (Memory.py:55-80)."""

    def __init__(self, memory_fields: List[str] = ()):  # noqa: B006
        self.data: Dict[str, list] = {k: [] for k in BASE_KEYS}
        for f in memory_fields:
            self.data[f] = []

    def __len__(self) -> int:
        return len(self.data["observations"])

    def clear(self):
        for k in self.data:
            del self.data[k][:]

    def add_observation(self, observation):
        assert (
            len(self.data["rewards"]) == len(self.data["is_terminal"])
            == len(self.data["actions"]) == len(self.data["observations"])
        )
        self.data["observations"].append(deepcopy(observation))

    def add_action(self, action):
        assert (
            len(self.data["rewards"]) == len(self.data["is_terminal"])
            == len(self.data["actions"]) == len(self.data["observations"]) - 1
        )
        self.data["actions"].append(deepcopy(action))

    def add_rewards_and_termination(self, reward, termination):
        assert (
            len(self.data["rewards"]) == len(self.data["is_terminal"])
            == len(self.data["actions"]) - 1
            == len(self.data["observations"]) - 1
        )
        self.data["rewards"].append(float(reward))
        self.data["is_terminal"].append(float(termination))

    def add_value(self, key, value):
        self.data.setdefault(key, []).append(deepcopy(value))

    def keys(self):
        return list(self.data)

    def done(self):
        return bool(self.data["is_terminal"]) and self.data["is_terminal"][-1]

    def dump(self, hdf5_path: str, log: bool = False):
        """Write the episode; returns the episode group key prefix."""
        if len(self) < 1:
            return None
        with FileLock(hdf5_path + ".lock"):
            with h5py.File(hdf5_path, "a") as f:
                last_key = None
                for last_key in f:  # noqa: B007 - want the last key
                    pass
                key_idx = (
                    int(last_key.split("_")[0]) if last_key is not None else 0
                )
                while True:
                    group_key = f"{key_idx:09d}"
                    if (
                        group_key + "_step00" not in f
                        and group_key + "_step00_last" not in f
                    ):
                        break
                    key_idx += 1
                for step in range(len(self)):
                    step_key = group_key + f"_step{step:02d}"
                    if step == len(self) - 1:
                        step_key += "_last"
                    try:
                        group = f.create_group(step_key)
                    except Exception:
                        group = f.create_group(
                            step_key + "_" + str(random.randint(0, 100000)))
                    for key, values in self.data.items():
                        if key in _FIRST_STEP_ONLY and step != 0:
                            continue
                        if step >= len(values):
                            continue
                        v = values[step]
                        try:
                            if isinstance(v, (float, int, str, np.floating,
                                              np.integer)):
                                group.attrs[key] = v
                            elif isinstance(v, list):
                                sub = group.create_group(key)
                                for i, item in enumerate(v):
                                    sub.create_dataset(
                                        f"{i:09d}", data=np.asarray(item),
                                        compression="gzip",
                                        compression_opts=9)
                            else:
                                group.create_dataset(
                                    key, data=np.asarray(v),
                                    compression="gzip", compression_opts=9)
                        except Exception as e:  # pragma: no cover
                            if log:
                                print(f"[Memory] dump key {key} error:", e)
                return group_key
