"""Replay-buffer metrics aggregation.

Produces the same scalar/histogram key families as the reference's
collect_stats (reference: utils.py:186-391) from the same HDF5 replay
schema: per-difficulty delta/final/init/best coverage, per-step
distributions, primitive-usage proportions; excludes flagged episodes
(failed_grasp / cloth_stuck / timed_out) and near-empty states
(postaction < 5% of max), like the reference does."""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, Optional

import h5py
import numpy as np

try:
    from filelock import FileLock
except ImportError:  # pragma: no cover
    import contextlib

    def FileLock(_p):  # type: ignore
        return contextlib.nullcontext()

_ERROR_FLAGS = ("failed_grasp", "cloth_stuck", "timed_out")


def get_dataset_size(path: str) -> int:
    if not os.path.exists(path):
        return 0
    with FileLock(path + ".lock"):
        with h5py.File(path, "r") as f:
            return len(f)


def collect_stats(
    dataset_path: str,
    num_points: int = 128,
    action_primitives=("fling", "stretchdrag", "drag", "place"),
    filter_keys_fn=None,
) -> Optional[Dict]:
    if not os.path.exists(dataset_path):
        return None
    with FileLock(dataset_path + ".lock"):
        with h5py.File(dataset_path, "r") as f:
            keys = list(f.keys())
            if filter_keys_fn is not None:
                keys = [k for i, k in enumerate(keys)
                        if filter_keys_fn(i, k)]
            elif len(keys) > num_points:
                keys = keys[-num_points:]
            num_points = max(len(keys), 1)

            # keyed by whatever task_difficulty values appear (easy / hard /
            # shirt / ...) so e.g. shirt episodes get their own stat family
            # instead of being silently mixed into "hard"
            delta_cov = defaultdict(list)
            final_cov = defaultdict(list)
            init_cov = defaultdict(list)
            best_cov = defaultdict(lambda: defaultdict(float))
            ep_delta = defaultdict(list)
            ep_len = defaultdict(list)
            step_delta = defaultdict(lambda: defaultdict(list))
            step_post = defaultdict(lambda: defaultdict(list))
            step_pre = defaultdict(lambda: defaultdict(list))
            prim_counts = {ap: 0 for ap in action_primitives}

            for k in keys:
                g = f[k]
                attrs = g.attrs
                if any(attrs.get(flag, False) for flag in _ERROR_FLAGS):
                    continue
                if "max_coverage" not in attrs:
                    continue
                mx = float(attrs["max_coverage"])
                post = float(attrs.get("postaction_coverage", 0.0)) / mx
                pre = float(attrs.get("preaction_coverage", 0.0)) / mx
                if post < 0.05:
                    continue
                level = str(attrs.get("task_difficulty", "hard"))
                episode = k.split("_step")[0]
                step = k.split("step")[1].split("_")[0]
                delta_cov[level].append(post - pre)
                step_delta[level][step].append(post - pre)
                step_post[level][step].append(post)
                step_pre[level][step].append(pre)
                prim = str(attrs.get("action_primitive", ""))
                if prim in prim_counts:
                    prim_counts[prim] += 1
                best_cov[level][episode] = max(best_cov[level][episode], post)
                if "last" in k:
                    ep_len[level].append(int(step))
                    final_cov[level].append(post)
                    init_cov[level].append(
                        float(attrs.get("init_coverage", 0.0)) / mx)
                    ep_delta[level].append(final_cov[level][-1]
                                           - init_cov[level][-1])

            retval = {}

            def emit(name, data):
                for level, vals in data.items():
                    if not len(vals):
                        continue
                    arr = np.asarray(vals, np.float64)
                    retval[f"{name}/{level}/distribution"] = arr
                    retval[f"{name}/{level}/mean"] = arr.mean()
                    retval[f"{name}/{level}/max"] = arr.max()
                    retval[f"{name}/{level}/min"] = arr.min()
                    if name == "delta_coverage":
                        n = len(arr)
                        retval[f"{name}/{level}/percent_positive"] = (
                            np.count_nonzero(arr > 0) / n)
                        retval[f"{name}/{level}/percent_negative"] = (
                            np.count_nonzero(arr < 0) / n)
                        retval[f"{name}/{level}/percent_zero"] = (
                            np.count_nonzero(arr == 0) / n)

            emit("delta_coverage", delta_cov)
            emit("final_coverage", final_cov)
            emit("init_coverage", init_cov)
            emit("episode_delta_coverage", ep_delta)
            emit("episode_length", ep_len)
            emit("best_coverage", {
                lvl: list(d.values()) for lvl, d in best_cov.items()})
            retval["delta_coverage_steps"] = {
                lvl: dict(d) for lvl, d in step_delta.items()}
            retval["postaction_coverage_steps"] = {
                lvl: dict(d) for lvl, d in step_post.items()}
            retval["preaction_coverage_steps"] = {
                lvl: dict(d) for lvl, d in step_pre.items()}
            for ap in ("fling", "drag", "place"):
                if ap in prim_counts:
                    retval[f"action_primitive/percent_{ap}"] = (
                        prim_counts[ap] / num_points)

            # sample before/after image panel for dashboards
            # (collect_stats img_before_after parity, utils.py:377-390)
            import random as _random

            for _ in range(3):
                k = _random.choice(keys) if keys else None
                if k is None:
                    break
                g = f[k]
                if ("pretransform_observations" in g
                        and "next_observations" in g):
                    before = np.asarray(
                        g["pretransform_observations"])[:3]
                    after = np.asarray(g["next_observations"])[:3]
                    retval["img_before_after"] = np.concatenate(
                        [before, after], axis=2)  # (3, H, 2W)
                    # action-annotated panel (utils.py:377-390 draws the
                    # grasp line on the observation)
                    if "pretransform_pixels" in g:
                        from flingbot_tpu.utils.vis import draw_action

                        try:
                            img = np.transpose(before, (1, 2, 0)).copy()
                            img = draw_action(
                                img,
                                str(g.attrs.get("action_primitive",
                                                "fling")),
                                np.asarray(g["pretransform_pixels"]),
                                thickness=2)
                            retval["img_action"] = np.transpose(
                                img, (2, 0, 1))
                        except Exception:
                            pass
                    # normalized value-map panel (utils.py:383-388)
                    if "value_map" in g:
                        vm = np.asarray(g["value_map"], np.float32)
                        vm = (vm - vm.min()) / max(vm.max() - vm.min(),
                                                   1e-9)
                        retval["img_value_map"] = vm[None]  # (1, D, D)
                    break
            return retval
