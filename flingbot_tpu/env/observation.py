"""Observation pipeline: render -> masks -> adaptive scaling -> transform
stack — all on device.

Replaces SimEnv.get_obs / render_cloth / get_cloth_mask
(reference: environment/simEnv.py:690-737): one render produces RGB-D, the
cloth mask comes straight from depth (the `depth != 2.0` convention,
simEnv.py:235 — no HSV segmentation round trip is needed because we own the
renderer), adaptive scale factors shrink the action crops to fit the cloth
(simEnv.py:719-732), and the 96-view transform stack is one batched warp.

The same warp also produces the dense action-validity channels used by
action.py, so obs and masks share one gather."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flingbot_tpu.render.camera import CAMERA_HEIGHT, pixel_to_world
from flingbot_tpu.render.rasterizer import render_rgbd
from flingbot_tpu.learning.transforms import prepare_image

# dual-arm bases + reach (simEnv.py:100-103; config reach_distance_limit)
LEFT_ARM_BASE = (0.765, 0.0, 0.0)
RIGHT_ARM_BASE = (-0.765, 0.0, 0.0)


class Observation(NamedTuple):
    rgb: jnp.ndarray  # (S, S, 3)
    depth: jnp.ndarray  # (S, S)
    cloth_mask: jnp.ndarray  # (S, S) bool
    obs_stack: jnp.ndarray  # (T, 4, D, D) transformed observations
    mask_stack: jnp.ndarray  # (T, 5, D, D): depth, reach_l, reach_r, grasp, inbounds
    grasp_ok: jnp.ndarray  # (S, S) eroded cloth mask (conservative grasp)
    adaptive_scales: jnp.ndarray  # (S_scales,) scale factors actually used
    adaptive_ratio: jnp.ndarray  # scalar crop ratio (1.0 if no shrink)


def _erode_disk(mask, radius: int):
    """Binary erosion by a disk — the conservative grasp-circle test
    (simEnv.py:237-253) evaluated densely for every pixel."""
    if radius <= 0:
        return mask
    out = mask
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy * dy + dx * dx > radius * radius or (dy == 0 and dx == 0):
                continue
            out = out & jnp.roll(jnp.roll(mask, dy, axis=0), dx, axis=1)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("image_size", "obs_dim", "conservative_grasp_radius",
                     "use_adaptive_scaling"),
)
def compute_observation(
    positions,
    active,
    rotations,
    scale_factors,
    image_size: int = 400,
    obs_dim: int = 64,
    conservative_grasp_radius: int = 1,
    use_adaptive_scaling: bool = True,
    reach_distance_limit: float = 1.2,
    cloth_color=(0.35, 0.35, 0.85),
    dr_key=None,
    faces=None,
    tri_mask=None,
) -> Observation:
    rgb, depth = render_rgbd(
        positions, active, image_size=image_size, cloth_color=cloth_color,
        dr_key=dr_key, faces=faces, tri_mask=tri_mask)
    cloth_mask = depth < CAMERA_HEIGHT - 1e-4

    # adaptive scaling from the mask bounding box (simEnv.py:719-732)
    S = image_size
    rows = jnp.any(cloth_mask, axis=1)
    cols = jnp.any(cloth_mask, axis=0)
    idx = jnp.arange(S)
    rmin = jnp.min(jnp.where(rows, idx, S))
    rmax = jnp.max(jnp.where(rows, idx, -1))
    cmin = jnp.min(jnp.where(cols, idx, S))
    cmax = jnp.max(jnp.where(cols, idx, -1))
    croprow = jnp.maximum(S - 2 * rmin, S - 2 * (S - rmax))
    cropcol = jnp.maximum(S - 2 * cmin, S - 2 * (S - cmax))
    crop = jnp.maximum(croprow, cropcol) * 1.5  # breathing room
    any_cloth = jnp.any(rows)
    ratio = jnp.where(
        any_cloth & (crop < S), crop / S, 1.0).astype(jnp.float32)
    if not use_adaptive_scaling:
        ratio = jnp.float32(1.0)
    scales = jnp.asarray(scale_factors, jnp.float32) * ratio

    # world positions per pixel for reachability (pixel -> 3D unproject,
    # the dense analog of check_action_reachability, simEnv.py:539-558)
    rr = jnp.arange(S, dtype=jnp.float32)[:, None]
    cc = jnp.arange(S, dtype=jnp.float32)[None, :]
    world = pixel_to_world(
        jnp.broadcast_to(rr, (S, S)), jnp.broadcast_to(cc, (S, S)),
        depth, S)
    left = jnp.asarray(LEFT_ARM_BASE)
    right = jnp.asarray(RIGHT_ARM_BASE)
    reach_l = jnp.linalg.norm(world - left, axis=-1) < reach_distance_limit
    reach_r = jnp.linalg.norm(world - right, axis=-1) < reach_distance_limit

    grasp_ok = _erode_disk(cloth_mask, conservative_grasp_radius)

    # one batched warp for obs (rgb+depth) and validity channels; the warp
    # appends a true in-bounds channel for samples inside the source image.
    # grasp_ok rides the same warp so action.py can test the grasp-circle
    # cloth condition densely at every candidate pixel (simEnv.py:235-253).
    stacked_src = jnp.concatenate(
        [
            rgb,
            depth[..., None],
            reach_l[..., None].astype(jnp.float32),
            reach_r[..., None].astype(jnp.float32),
            grasp_ok[..., None].astype(jnp.float32),
        ],
        axis=-1,
    )
    warped = prepare_image(
        stacked_src, rotations, scales, out_dim=obs_dim, with_valid=True)
    obs_stack = warped[:, :4]
    mask_stack = warped[:, 3:]  # depth, reach_l, reach_r, grasp, inbounds
    return Observation(
        rgb=rgb,
        depth=depth,
        cloth_mask=cloth_mask,
        obs_stack=obs_stack,
        mask_stack=mask_stack,
        grasp_ok=grasp_ok,
        adaptive_scales=scales,
        adaptive_ratio=ratio,
    )
