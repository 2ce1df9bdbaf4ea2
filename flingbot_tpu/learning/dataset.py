"""Replay dataset: reads flingbot-format replay HDF5 into training batches.

GraspDataset parity (reference: learning/utils.py:12-100): reward =
(postaction - preaction) coverage, normalized by the task's max coverage (or
min-max normalized with the recorded constants), obs optionally reduced to
RGB or depth, RGB optionally color-jittered (the stand-in for Blender domain
randomization), plus the self-healing validity check that deletes malformed
groups (learning/utils.py:58-71).

Torch-free: batches are numpy arrays ready for device upload; sampling is
a host-side RNG choice (the DataLoader worker pool becomes simple prefetch).
"""

from __future__ import annotations

from typing import Callable, Optional

import h5py
import numpy as np

REWARDS_MAX = 0.20572495126190674
REWARDS_MIN = -0.11034914070874759


def color_jitter(rng: np.random.Generator, rgb: np.ndarray,
                 brightness=0.2, contrast=0.3, saturation=0.5,
                 hue=0.5) -> np.ndarray:
    """Cheap HSV-free approximation of torchvision ColorJitter
    (learning/utils.py:28-34) on a (3, H, W) float image in [0, 1]."""
    out = rgb
    b = 1.0 + rng.uniform(-brightness, brightness)
    out = out * b
    c = 1.0 + rng.uniform(-contrast, contrast)
    mean = out.mean()
    out = (out - mean) * c + mean
    s = 1.0 + rng.uniform(-saturation, saturation)
    gray = out.mean(axis=0, keepdims=True)
    out = (out - gray) * s + gray
    # hue: rotate channels toward a random permutation blend
    h = rng.uniform(0, hue)
    rolled = np.roll(out, 1, axis=0)
    out = (1 - h) * out + h * rolled
    return np.clip(out, 0.0, 1.0).astype(np.float32)


class GraspDataset:
    def __init__(
        self,
        hdf5_path: str,
        depth_only: bool = False,
        rgb_only: bool = False,
        check_validity: bool = False,
        filter_fn: Optional[Callable] = None,
        obs_color_jitter: bool = True,
        use_normalized_coverage: bool = True,
        mirror_augment: bool = False,
        dihedral_augment: bool = False,
        seed: int = 0,
        **_unused,
    ):
        assert not (depth_only and rgb_only)
        self.hdf5_path = hdf5_path
        self.filter_fn = filter_fn
        self.depth_only = depth_only
        self.rgb_only = rgb_only
        self.obs_color_jitter = obs_color_jitter
        # mirror augmentation (beyond-reference, physics-sound): cloth
        # dynamics have no chirality, so x-flipping the observation AND the
        # action mask together yields an equally-valid (obs, action,
        # reward) transition — free 2x effective data.  Off by default for
        # reference parity; enable with --mirror_augment.
        #
        # dihedral_augment extends this to the full D4 group (4 right-angle
        # rotations x optional flip = 8 views): physics is invariant under
        # any rotation about a vertical axis (gravity is vertical, the
        # floor is a uniform infinite plane, the fling primitive rotates
        # with the grasp-pair axis), and the transformed views are square,
        # so rot90(obs)+rot90(action) is as valid as the x-flip.
        self.mirror_augment = mirror_augment
        self.dihedral_augment = dihedral_augment
        self.use_normalized_coverage = use_normalized_coverage
        self.rng = np.random.default_rng(seed)
        self._seen: set = set()
        self.keys: list = []
        self.refresh()
        if check_validity:
            for k in list(self.keys):
                self._check_validity(k)
            self._seen = set()
            self.keys = []
            self.refresh()

    def refresh(self) -> int:
        """Scan only keys added since the last call (opening every group to
        re-apply the filter each optimize round is O(dataset) of HDF5
        group opens — a per-round cost that grows with training).  Returns
        the number of keys appended."""
        added = 0
        with h5py.File(self.hdf5_path, "r") as f:
            for k in f:
                if k in self._seen:
                    continue
                self._seen.add(k)
                try:
                    if self.filter_fn is None or self.filter_fn(f[k]):
                        self.keys.append(k)
                        added += 1
                except Exception:
                    pass
        return added

    def _check_validity(self, key):
        """Delete malformed groups (learning/utils.py:58-71)."""
        with h5py.File(self.hdf5_path, "a") as f:
            g = f.get(key)
            if g is None:
                return
            bad = (
                "actions" not in g
                or "observations" not in g
                or "postaction_coverage" not in g.attrs
                or "preaction_coverage" not in g.attrs
            )
            if not bad:
                a = np.asarray(g["actions"])
                bad = a.sum() != 1 or np.asarray(g["observations"]).ndim == 4
            if bad:
                del f[key]

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index: int):
        with h5py.File(self.hdf5_path, "r") as f:
            g = f[self.keys[index]]
            reward = float(
                g.attrs["postaction_coverage"] - g.attrs["preaction_coverage"])
            if self.use_normalized_coverage:
                reward /= float(g.attrs["max_coverage"])
            else:
                reward = (reward - REWARDS_MIN) / (REWARDS_MAX - REWARDS_MIN)
            obs = np.asarray(g["observations"], np.float32)
            action = np.asarray(g["actions"]).astype(bool)
        if self.rgb_only:
            rgb = obs[:3]
            if self.obs_color_jitter:
                rgb = color_jitter(self.rng, rgb)
            obs = np.concatenate([rgb, obs[3:4]], axis=0)
        elif self.depth_only:
            pass  # the net slices channel 3 itself
        if self.dihedral_augment:
            k = int(self.rng.integers(0, 4))
            if k:
                obs = np.rot90(obs, k, axes=(-2, -1))
                action = np.rot90(action, k, axes=(-2, -1))
            if self.rng.random() < 0.5:
                obs = obs[..., ::-1]
                action = action[..., ::-1]
            obs = np.ascontiguousarray(obs)
            action = np.ascontiguousarray(action)
        elif self.mirror_augment and self.rng.random() < 0.5:
            obs = obs[..., ::-1].copy()
            action = action[..., ::-1].copy()
        return obs, action, np.float32(reward)

    def sample_batch(self, batch_size: int):
        """Uniform random batch -> (obs (B,4,D,D), mask (B,D,D), r (B,))."""
        if len(self) == 0:
            return None
        idx = self.rng.integers(0, len(self), batch_size)
        obs, masks, rewards = zip(*(self[int(i)] for i in idx))
        return (
            np.stack(obs),
            np.stack(masks).astype(np.float32),
            np.asarray(rewards, np.float32),
        )


class PrefetchLoader:
    """Background-thread batch prefetcher — the TPU-side stand-in for the
    reference's DataLoader(num_workers=...) (utils.py:171-176): batches are
    assembled on a daemon thread while the device trains on the previous
    one."""

    def __init__(self, dataset: GraspDataset, batch_size: int,
                 queue_depth: int = 2):
        import queue
        import threading

        self.dataset = dataset
        self.batch_size = batch_size
        self._q = queue.Queue(maxsize=queue_depth)
        self._stop = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop:
            batch = self.dataset.sample_batch(self.batch_size)
            if batch is None:
                self._stop = True
                break
            self._q.put(batch)

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop and self._q.empty():
            raise StopIteration
        return self._q.get()

    def close(self):
        self._stop = True
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
